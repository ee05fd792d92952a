package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Ported literal expectations from the reference's dimension tests
  * (core/index/src/test/.../dimension/BasicDimensionDefinitionTest.java,
  * bin/BinRangeTest.java): normalization midpoints, bound clamping and
  * single-bin range semantics over a [20, 100] dimension. */
class DimsPortSpec extends AnyFunSuite {

  private val dim = BasicDim(20, 100)
  private val Delta = 1e-15

  test("normalize mid/lower/upper values (BasicDimensionDefinitionTest)") {
    assert(math.abs(dim.normalize(60) - 0.5) <= Delta)
    assert(math.abs(dim.normalize(20) - 0.0) <= Delta)
    assert(math.abs(dim.normalize(100) - 1.0) <= Delta)
  }

  test("out-of-bounds values clamp to the dimension bounds") {
    assert(math.abs(dim.normalize(1) - 0.0) <= Delta)   // below → min
    assert(math.abs(dim.normalize(150) - 1.0) <= Delta) // above → max
  }

  test("an unbinned range normalizes to exactly one bin") {
    val bins = dim.getNormalizedRanges(NumericData(40, 50))
    assert(bins.length == 1)
    assert(bins(0).normMin == 40.0 && bins(0).normMax == 50.0)
    assert(!bins(0).fullExtent)
  }

  test("out-of-bounds ranges clamp to [min, max] (testNormalizeClampOutOfBoundsRanges)") {
    val bins = dim.getNormalizedRanges(NumericData(1, 150))
    assert(bins.length == 1)
    assert(math.abs(bins(0).normMin - 20.0) <= Delta)
    assert(math.abs(bins(0).normMax - 100.0) <= Delta)
  }

  test("BinRange carries raw values and full-extent flag (BinRangeTest)") {
    val plain = new BinRange(20, 100)
    assert(plain.normMin == 20.0 && plain.normMax == 100.0 && !plain.fullExtent)
    val full = BinRange(Array[Byte](0, 0, 0, 120), 20, 100, fullExtent = true)
    assert(full.normMin == 20.0 && full.normMax == 100.0 && full.fullExtent)
    assert(java.nio.ByteBuffer.wrap(full.binId).getInt == 120)
  }
}

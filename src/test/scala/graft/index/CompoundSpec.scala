package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Compound._

/**
 * Port of the reference's CompoundIndexStrategyTest (core/index/.../
 * CompoundIndexStrategyTest.java:1-363) over the same fixture: a 1-D
 * 16-bit Hilbert strategy on [0,1000] composed with a 2-D 16/16-bit
 * Hilbert strategy on [-180,180]×[-90,90], queried with the test's exact
 * literal ranges, plus its literal 12-byte compound insertion id.
 * (testBinaryEncoding is the reference's SPI PersistenceUtils round-trip —
 * serialization plumbing outside this port's scope.)
 */
class CompoundSpec extends AnyFunSuite {

  private val simple = TieredStrategy.singleTier(
    Array(BasicDim(0, 1000)), Array(16))
  private val sfc = TieredStrategy.singleTier(
    Array(BasicDim(-180, 180), BasicDim(-90, 90)), Array(16, 16))
  private val compound = new CompoundStrategy(simple, sfc)

  private val d1 = NumericData(2, 4)
  private val d2 = NumericData(50.0, 50.025)
  private val d3 = NumericData(-20.5, -20.455)
  private val simpleRange = Array(d1)
  private val sfcRange = Array(d2, d3)
  private val compoundRange = Array(d1, d2, d3)

  private def keySet(rs: Seq[CompoundRange]): Set[(Seq[Byte], Seq[Byte])] =
    rs.map(r => (r.start.toSeq, r.end.toSeq)).toSet
  private def idSet(ids: Seq[Array[Byte]]): Set[Seq[Byte]] = ids.map(_.toSeq).toSet

  test("testNumberOfDimensionsPerIndexStrategy / testGetNumberOfDimensions") {
    assert(compound.numDimensionsPerStrategy.toSeq === Seq(1, 2))
    assert(compound.numDimensions === 3)
  }

  test("testCompositionOfByteArrayId: compose/decompose round-trip") {
    val id1 = "hello".getBytes("UTF-8")
    val id2 = "world!!".getBytes("UTF-8")
    val (b1, b2) = decompose(compose(id1, id2))
    assert(b1.sameElements(id1) && b2.sameElements(id2))
    // layout: id1 ‖ id2 ‖ int32BE(len(id1))
    val c = compose(id1, id2)
    assert(c.length === id1.length + id2.length + 4)
    assert(java.nio.ByteBuffer.wrap(c).getInt(c.length - 4) === id1.length)
  }

  test("testGetQueryRangesWithMaximumNumberOfRanges: compound == cross product (unlimited)") {
    val expected = for (a <- simple.getQueryRanges(simpleRange);
                        b <- sfc.getQueryRanges(sfcRange))
      yield CompoundRange(compose(a.start, b.start), compose(a.end, b.end))
    assert(keySet(compound.getQueryRanges(compoundRange)) === keySet(expected))
    assert(expected.nonEmpty)
  }

  test("testGetQueryRanges: capped cross product uses ceil(sqrt(max)) then max/|ranges1|") {
    val r1 = simple.getQueryRanges(simpleRange, 3) // ceil(sqrt(8)) = 3
    val r2 = sfc.getQueryRanges(sfcRange, 8 / r1.size)
    val expected = for (a <- r1; b <- r2)
      yield CompoundRange(compose(a.start, b.start), compose(a.end, b.end))
    assert(keySet(compound.getQueryRanges(compoundRange, 8)) === keySet(expected))
  }

  test("testGetInsertionIds: compound == cross product under the sqrt duplicate split") {
    val ids1 = simple.getInsertionIds(simpleRange, 3L)
    val ids2 = sfc.getInsertionIds(sfcRange, (8 / ids1.size).toLong)
    val expected = for (a <- ids1; b <- ids2) yield compose(a, b)
    assert(idSet(compound.getInsertionIds(compoundRange, 8)) === idSet(expected))
  }

  // the reference test's literal compound insertion id
  private val literalId = Array[Byte](16, 0, -125, 16, -46, -93, -110, -31, 0, 0, 0, 3)

  test("testGetCoordinatesPerDimension: literal id decomposes and coordinates concatenate") {
    val (id1, id2) = decompose(literalId)
    assert(id1.toSeq === Seq[Byte](16, 0, -125))
    assert(id2.toSeq === Seq[Byte](16, -46, -93, -110, -31))
    val c1 = simple.getCoordinates(id1)
    val c2 = sfc.getCoordinates(id2)
    val c = compound.getCoordinatesPerDimension(literalId)
    assert(c.toSeq === (c1 ++ c2).toSeq)
    assert(c.length === 3)
  }

  test("testGetRangeForId: literal id cell bounds concatenate sub-strategy bounds") {
    val (id1, id2) = decompose(literalId)
    val r1 = simple.getRangeForId(id1)
    val r2 = sfc.getRangeForId(id2)
    val r = compound.getRangeForId(literalId)
    assert(r1.length === 1 && r2.length === 2 && r.length === 3)
    assert(r(0).min === r1(0).min && r(0).max === r1(0).max)
    assert(r(1).min === r2(0).min && r(1).max === r2(0).max)
    assert(r(2).min === r2(1).min && r(2).max === r2(1).max)
  }

  test("testGetHighestPrecisionIdRangePerDimension: concatenated finest cell widths") {
    val p = compound.getHighestPrecisionIdRangePerDimension
    assert(p.toSeq === Seq(1000.0 / 65536, 360.0 / 65536, 180.0 / 65536))
  }

  test("insertion ids for a point round-trip through query ranges") {
    // a point: every compound insertion id must be covered by some
    // unlimited compound query range for the same point
    val pt = Array(NumericData(3.0, 3.0), NumericData(50.01, 50.01),
      NumericData(-20.47, -20.47))
    val ids = compound.getInsertionIds(pt, 8)
    val ranges = compound.getQueryRanges(pt)
    def le(a: Array[Byte], b: Array[Byte]): Boolean = ByteUtils.compareUnsigned(a, b) <= 0
    assert(ids.nonEmpty)
    for (id <- ids)
      assert(ranges.exists(r => le(r.start, id) && le(id, r.end)),
        s"id ${id.toSeq} not covered")
  }
}

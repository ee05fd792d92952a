package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{BinRange, NumericData}

/**
 * Port of the reference's value-model unit tests over [[NumericData]] /
 * [[BinRange]] (core/index/src/test/java/.../sfc/data/NumericValueTest
 * .java, NumericRangeTest.java, BasicNumericDatasetTest.java and
 * .../dimension/bin/BinValueTest.java): a point datum is min == max with
 * a degenerate centroid; a range datum centers at (min+max)/2; a
 * multi-dimensional dataset is the per-dimension array of data; a bin
 * value pairs a bin id with its in-bin range.
 */
class ValueModelSpec extends AnyFunSuite {

  test("NumericValueTest: a point datum") {
    val v = NumericData(50, 50)
    assert(v.min === 50.0 && v.max === 50.0)
    assert(v.centroid === 50.0)
    assert(v.isPoint) // the reference's !isRange()
  }

  test("NumericRangeTest: a range datum") {
    val r = NumericData(20, 100)
    assert(r.min === 20.0 && r.max === 100.0)
    assert(r.centroid === 60.0)
    assert(!r.isPoint)
  }

  test("BasicNumericDatasetTest: per-dimension arrays of a multi-dim dataset") {
    val ds = Array(NumericData(10, 10), NumericData(20, 100), NumericData(-5, 5))
    assert(ds.map(_.min).toSeq === Seq(10.0, 20.0, -5.0))
    assert(ds.map(_.max).toSeq === Seq(10.0, 100.0, 5.0))
    assert(ds.map(_.centroid).toSeq === Seq(10.0, 60.0, 0.0))
    assert(ds.length === 3)
  }

  test("BinValueTest: a bin value pairs its id bytes with the in-bin range") {
    val binId = java.nio.ByteBuffer.allocate(4).putInt(2).array()
    val bv = BinRange(binId, 100, 100, fullExtent = false)
    assert(java.nio.ByteBuffer.wrap(bv.binId).getInt === 2)
    assert(bv.normMin === 100.0 && bv.normMax === 100.0)
    assert(!bv.fullExtent)
  }
}

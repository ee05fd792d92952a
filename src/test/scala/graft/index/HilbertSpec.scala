package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's SFC golden tests
  * (core/geotime/src/test/.../HilbertSFCTest.java:25-277). */
class HilbertSpec extends AnyFunSuite {

  private def spatialSfc(dims: Array[NumericDim]): HilbertSFC =
    new HilbertSFC(dims.map(d => SFCDimension(d, 31)))

  private def toLong(b: Array[Byte]): Long = {
    require(b.length == 8)
    java.nio.ByteBuffer.wrap(b).getLong
  }

  // dims ordered [lat, lon] as in HilbertSFCTest.java:37-44
  private val latLon = spatialSfc(Array(LatitudeDim(), LongitudeDim))

  test("getId 2D spatial max value (HilbertSFCTest.java:25-54)") {
    assert(toLong(latLon.getId(Array(90, 180))) === 3074457345618258602L)
  }

  test("getId 2D spatial min value (HilbertSFCTest.java:56-87)") {
    assert(toLong(latLon.getId(Array(-90, -180))) === 0L)
  }

  test("getId 2D spatial centroid value (HilbertSFCTest.java:89-119)") {
    assert(toLong(latLon.getId(Array(0, 0))) === 768614336404564650L)
  }

  test("getId lexicographic ordering (HilbertSFCTest.java:121-154)") {
    assert(ByteUtils.compareUnsigned(
      latLon.getId(Array(-90, -180)), latLon.getId(Array(90, 180))) < 0)
  }

  // dims ordered [lon, lat] as in HilbertSFCTest.java:189-232
  private val lonLat = spatialSfc(Array(LongitudeDim, LatitudeDim()))

  test("decompose query: one index filter (HilbertSFCTest.java:189-232)") {
    val ranges = lonLat.decomposeRange(
      Array(NumericData(55, 57), NumericData(25, 27)),
      overInclusiveOnEdge = true, 1)
    assert(ranges.length === 1)
  }

  test("decompose query: twenty index filters (HilbertSFCTest.java:234-276)") {
    val ranges = lonLat.decomposeRange(
      Array(NumericData(10, 57), NumericData(25, 50)),
      overInclusiveOnEdge = true, 20)
    assert(ranges.length === 20)
  }

  test("decomposed ranges cover the query and are sorted & disjoint") {
    val query = Array(NumericData(10, 57), NumericData(25, 50))
    val ranges = lonLat.decomposeRange(query, overInclusiveOnEdge = true, 100)
    assert(ranges.length === 100)
    val longs = ranges.map(r => (lonLat.bytesToId(r.start), lonLat.bytesToId(r.end)))
    longs.foreach { case (s, e) => assert(s <= e) }
    longs.sliding(2).foreach { case Array((_, e1), (s2, _)) => assert(e1 < s2); case _ => }
    // every sample point inside the query must land in some range
    val rng = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val lon = 10 + rng.nextDouble() * 47
      val lat = 25 + rng.nextDouble() * 25
      val id = lonLat.bytesToId(lonLat.getId(Array(lon, lat)))
      assert(longs.exists { case (s, e) => id >= s && id <= e },
        s"point ($lon,$lat) id $id not covered")
    }
  }

  test("index/indexInverse roundtrip at 31+31 and 20/20/20 bits") {
    val rng = new scala.util.Random(42)
    val ch2 = new CompactHilbert(Array(31, 31))
    (0 until 5000).foreach { _ =>
      val p = Array(rng.nextLong(1L << 31), rng.nextLong(1L << 31))
      assert(ch2.indexInverse(ch2.index(p)).sameElements(p))
    }
    val ch3 = new CompactHilbert(Array(20, 20, 20))
    (0 until 5000).foreach { _ =>
      val p = Array.fill(3)(rng.nextLong(1L << 20))
      assert(ch3.indexInverse(ch3.index(p)).sameElements(p))
    }
  }

  test("curve is bijective and continuous (true Hilbert curve)") {
    for (n <- Seq(2, 3)) {
      val m = if (n == 2) 5 else 3
      val ch = new CompactHilbert(Array.fill(n)(m))
      val size = 1L << m
      val total = 1L << (n * m)
      val seen = new Array[Boolean](total.toInt)
      var prev: Array[Long] = null
      var h = 0L
      while (h < total) {
        val p = ch.indexInverse(h)
        assert(ch.index(p) === h)
        if (prev != null) {
          val dist = (0 until n).map(j => math.abs(p(j) - prev(j))).sum
          assert(dist === 1, s"cells at h=${h - 1},$h not adjacent")
        }
        p.foreach(c => assert(c >= 0 && c < size))
        prev = p
        h += 1
      }
    }
  }

  test("cell bounds roundtrip: getRangesForId inverts getId") {
    val rng = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val lon = rng.nextDouble() * 360 - 180
      val lat = rng.nextDouble() * 180 - 90
      val id = lonLat.getId(Array(lon, lat))
      val bounds = lonLat.getRangesForId(id)
      assert(bounds(0).min <= lon && lon <= bounds(0).max, s"lon $lon outside ${bounds(0)}")
      assert(bounds(1).min <= lat && lat <= bounds(1).max, s"lat $lat outside ${bounds(1)}")
    }
  }
}

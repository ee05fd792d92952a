package graft.index

import org.scalatest.funsuite.AnyFunSuite
import java.util.{Calendar, TimeZone}

/** Port of TieredSFCIndexStrategyTest.java (structure, tier bytes, ID
  * lengths, duplication counts). */
class TieredStrategySpec extends AnyFunSuite {

  val DefinedBits: Array[Int] = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 18, 31)
  val Eps = 1e-12

  private def stDims: Array[NumericDim] =
    Array(LongitudeDim, LatitudeDim(useHalfRange = true), TimeDim.year)

  private def prefixEq(a: Array[Byte], b: Array[Byte], until: Int): Boolean =
    java.util.Arrays.equals(a.take(until), b.take(until))
  private def sliceEq(a: Array[Byte], b: Array[Byte], from: Int, until: Int): Boolean =
    java.util.Arrays.equals(a.slice(from, until), b.slice(from, until))

  test("single spatial-temporal entry: 13-byte ID, year-bin prefix (TieredSFCIndexStrategyTest.java:65-142)") {
    val strategy = TieredStrategy.defaultSpatialTemporal
    val cal = Calendar.getInstance(TimeZone.getTimeZone("GMT"))
    cal.set(2012, 5, 15, 12, 0, 0)
    val t1 = cal.getTimeInMillis.toDouble
    cal.set(Calendar.DAY_OF_YEAR, 1)
    val t2 = cal.getTimeInMillis.toDouble
    cal.set(Calendar.YEAR, 2011)
    val t3 = cal.getTimeInMillis.toDouble

    def point(t: Double) = Array(NumericData(45, 45), NumericData(45, 45), NumericData(t, t))

    val ids1 = strategy.getInsertionIds(point(t1))
    assert(ids1.size === 1)
    assert(ids1.head.length === 13) // 1 tier + 4 bin ("2012") + 8 sfc (60 bits)
    assert(new String(ids1.head.slice(1, 5)) === "2012")

    val ids2 = strategy.getInsertionIds(point(t2))
    assert(ids2.size === 1)
    assert(prefixEq(ids1.head, ids2.head, 5)) // same tier + same year bin

    val ids3 = strategy.getInsertionIds(point(t3))
    assert(ids3.size === 1)
    assert(!prefixEq(ids1.head, ids3.head, 5)) // different year bin
  }

  test("predefined spatial entries: exact-fit tiers and 2x/4x duplication (TieredSFCIndexStrategyTest.java:144-249)") {
    val dims: Array[NumericDim] = Array(LongitudeDim, LatitudeDim(useHalfRange = true))
    val strategy = TieredStrategy.definedPrecision(dims, Array(DefinedBits.clone, DefinedBits.clone))
    for (sfcIndex <- DefinedBits.indices) {
      val b = DefinedBits(sfcIndex)
      val precision = 360.0 / math.pow(2, b)
      val data =
        if (precision > 180) Array(NumericData(-180, 180), NumericData(-90, 90))
        else Array(NumericData(0, precision), NumericData(-precision, 0))
      val ids = strategy.getInsertionIds(data)

      // query ranges must contain exactly one start==end range at tier b
      val query = data.map(r => NumericData(r.min + Eps, r.max - Eps))
      val ranges = strategy.getQueryRanges(query)
      val atTier = ranges.filter(r => r.start(0) == b.toByte &&
        java.util.Arrays.equals(r.start, r.end))
      assert(atTier.size === 1, s"expected exactly one exact-fit range at tier $b")

      val exactMatch = ids.head(0) == 0.toByte ||
        sfcIndex == DefinedBits.length - 1 || DefinedBits(sfcIndex + 1) != b + 1
      if (exactMatch) {
        assert(ids.head(0) === b.toByte, s"tier byte at precision $b")
        assert(ids.size === 1)
      } else {
        assert(ids.head(0) === (b + 1).toByte, s"duplicated at tier ${b + 1}")
        val expected = if (precision > 90 && precision <= 180) 2 else 4
        assert(ids.size === expected, s"duplication count at tier ${b + 1}")
      }
    }
  }

  test("maxDuplicateIds=1 forces single ID at the exact-fit tier (TieredSFCIndexStrategyTest.java:251-297)") {
    val strategy = TieredStrategy.defaultSpatial
    for (b <- DefinedBits) {
      val precision = 360.0 / math.pow(2, b)
      val data =
        if (precision > 180) Array(NumericData(-180, 180), NumericData(-90, 90))
        else Array(NumericData(0, precision), NumericData(-precision, 0))
      val ids = strategy.getInsertionIds(data, 1)
      assert(ids.size === 1, s"at tier $b")
      assert(ids.head(0) === b.toByte, s"exact match at tier $b")
    }
  }

  test("regions: tier/bin structure over 4-tier 20/20/20 (TieredSFCIndexStrategyTest.java:299-411)") {
    val strategy = TieredStrategy.equalInterval(stDims, Array(20, 20, 20), numIndices = 4)
    val fmt = new java.text.SimpleDateFormat("MM-dd-yyyy HH:mm:ss")
    fmt.setTimeZone(TimeZone.getTimeZone("GMT"))
    val t0 = fmt.parse("03-03-1999 11:01:01").getTime.toDouble
    val t1 = fmt.parse("03-03-1999 11:05:01").getTime.toDouble

    val ids1 = strategy.getInsertionIds(Array(
      NumericData(45.170, 45.173), NumericData(50.190, 50.192), NumericData(t0, t1)))
    assert(ids1.size === 1)
    assert(ids1.head.length === 10) // 1 tier + 4 bin + 5 sfc (39 bits at tier 13)

    val ids2 = strategy.getInsertionIds(Array(
      NumericData(45, 50), NumericData(45, 50), NumericData(t0, t1)))
    assert(ids2.size === 1)
    assert(!prefixEq(ids1.head, ids2.head, 1)) // different tier
    assert(sliceEq(ids1.head, ids2.head, 1, 5)) // same year bin

    val t0p = fmt.parse("03-03-1998 11:01:01").getTime.toDouble
    val t1p = fmt.parse("03-03-1998 11:05:01").getTime.toDouble
    val ids3 = strategy.getInsertionIds(Array(
      NumericData(45.1701, 45.1703), NumericData(50.1901, 50.1902), NumericData(t0p, t1p)))
    assert(ids3.size === 1)
    assert(!sliceEq(ids1.head, ids3.head, 1, 5)) // different year bin
  }

  test("getRangeForId returns cell bounds containing the point") {
    val strategy = TieredStrategy.defaultSpatial
    val rng = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val lon = rng.nextDouble() * 360 - 180
      val lat = rng.nextDouble() * 180 - 90
      val ids = strategy.getInsertionIds(Array(NumericData(lon, lon), NumericData(lat, lat)))
      assert(ids.size === 1)
      val bounds = strategy.getRangeForId(ids.head)
      assert(bounds(0).min <= lon && lon <= bounds(0).max)
      assert(bounds(1).min <= lat && lat <= bounds(1).max)
    }
  }

  test("query ranges cover inserted points (spatial, random boxes)") {
    val strategy = TieredStrategy.defaultSpatial
    val rng = new scala.util.Random(5)
    (0 until 30).foreach { _ =>
      val lonMin = rng.nextDouble() * 340 - 180
      val latMin = rng.nextDouble() * 160 - 90
      val lonW = rng.nextDouble() * 20
      val latW = rng.nextDouble() * 20
      val query = Array(NumericData(lonMin, lonMin + lonW), NumericData(latMin, math.min(latMin + latW, 90)))
      val ranges = strategy.getQueryRanges(query, 4000)
      // points inside the box must fall in some range
      (0 until 50).foreach { _ =>
        val lon = lonMin + rng.nextDouble() * lonW
        val lat = latMin + rng.nextDouble() * math.max(0, math.min(latMin + latW, 90) - latMin)
        val id = strategy.getInsertionIds(Array(NumericData(lon, lon), NumericData(lat, lat))).head
        val covered = ranges.exists { r =>
          ByteUtils.compareUnsigned(r.start, id) <= 0 && ByteUtils.compareUnsigned(id, padEnd(r, id.length)) <= 0
        }
        assert(covered, s"point ($lon,$lat) not covered by query ranges")
      }
    }
  }

  private def padEnd(r: KeyRange, len: Int): Array[Byte] = {
    if (r.end.length >= len) r.end
    else r.end ++ Array.fill(len - r.end.length)(0xff.toByte)
  }
}

package graft.spark

import org.apache.spark.sql.functions._

/** Edge contracts fixed by the Ops review: millisecond-exact ST join
  * windows and the exact in-band longitude bound of the meters join. */
class DistanceJoinEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("distanceJoinST honors sub-second windows exactly (no seconds truncation)") {
    val pts = Seq(
      (1L, 0.0, 0.0, "2024-01-01 00:00:00.900"),
      (2L, 0.0, 0.0, "2024-01-01 00:00:01.100"), // 200 ms from id 1
      (3L, 0.0, 0.0, "2024-01-01 00:00:02.000")  // 900 ms from id 2
    ).toDF("id", "lon", "lat", "s").withColumn("ts", col("s").cast("timestamp"))
    def pairs(dtMillis: Long) =
      Ops.distanceJoinST(pts, "id", "ts", d = 1.0, dtMillis = dtMillis, bits = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 500 ms window: only the 200 ms pair (seconds truncation would have
    // dropped it — floor(0.9)=0 vs floor(1.1)=1 differ by a whole second)
    assert(pairs(500L) == Set((1L, 2L)))
    // 900 ms window admits the 900 ms pair inclusively
    assert(pairs(900L) == Set((1L, 2L), (2L, 3L)))
    // 199 ms window admits nothing
    assert(pairs(199L) == Set.empty)
  }

  test("distanceJoinMeters finds band-edge pairs the linear lon bound would drop") {
    // two points at lat 85 whose lon separation exceeds the small-angle
    // bound d/(R cos lat) in degrees but whose haversine distance is
    // within d — the exact asin bound must cover them
    val d = 108971.0
    val linearLonDeg = (d / (2 * math.Pi * 6371008.8 / 360.0)) / math.cos(math.toRadians(85.0))
    val sep = linearLonDeg + 0.005 // just past the linear bound
    val pts = Seq((1L, 0.0, 85.0), (2L, sep, 85.0)).toDF("id", "lon", "lat")
    val hav = {
      val dLon = math.toRadians(sep) / 2
      val a = math.cos(math.toRadians(85.0)) * math.cos(math.toRadians(85.0)) *
        math.sin(dLon) * math.sin(dLon)
      2.0 * 6371008.8 * math.asin(math.sqrt(a))
    }
    assert(hav < d, s"fixture must be within the radius (hav=$hav)")
    val got = Ops.distanceJoinMeters(pts, "id", d, bits = 6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"band-edge pair must be found: $got")
  }
}

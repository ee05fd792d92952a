package graft.spark

import org.apache.spark.sql.functions._

/**
 * Fixture semantics for [[FlatGeoSource]] against the reference plugins'
 * drop rules: GDELT (Java-split column-count window, actionGeoType gate,
 * empty coordinate skip, empty-token-null vs unparseable-numeric-kills-
 * the-line, 58-column source URL — GDELTIngestPlugin.java:150-360),
 * GeoLife (the vals.length == 7 gate, CRLF documents, -777 altitude
 * sentinel, coordinate wrapping, kept-row 0-based pointinstance,
 * first/last track timestamps — GeoLifeIngestPlugin.java:173-240) and
 * T-Drive (bad-timestamp rows kept with null ts, the logged-and-continue
 * path — TdriveIngestPlugin.java:110-130).
 */
class FlatGeoSourceSpec extends SparkTestBase {

  import spark.implicits._

  private def gdeltLine(id: String, date: String, geoType: String,
                        lat: String, lon: String, cols: Int = 57,
                        url: String = "", mentions: String = "3"): String = {
    val v = Array.fill(cols)("")
    v(0) = id; v(1) = date; v(6) = "ACTOR_ONE"
    v(31) = mentions; v(32) = "2"; v(33) = "7"; v(34) = "1.5"
    v(49) = geoType; v(51) = "US"; v(53) = lat; v(54) = lon
    v(cols - 1) = if (cols == 58) url else "20140103" // last col non-empty
    v.mkString("\t")
  }

  test("GDELT: count window, geo-type gate, empty coordinates, 58-col URL") {
    val lines = Seq(
      gdeltLine("1", "20140103", "1", "42.5", "-71.1"),             // keeps
      gdeltLine("2", "20140103", "0", "42.5", "-71.1"),             // geoType 0: no geo
      gdeltLine("3", "20140103", "1", "", "-71.1"),                 // empty lat
      gdeltLine("4", "20140103", "1", "42.5", "-71.1", cols = 58,
        url = "http://example.org/a"),                              // keeps, with URL
      gdeltLine("5", "20140103", "x", "42.5", "-71.1"),             // unparseable geoType
      gdeltLine("6", "2014x103", "1", "42.5", "-71.1"),             // unparseable date
      "short\tline"                                                 // wrong column count
    ).toDF("line")
    val got = FlatGeoSource.gdeltEvents(lines, "line", extended = true)
      .orderBy("eventid").collect()
    assert(got.map(_.getAs[Int]("eventid")).toSeq === Seq(1, 4))
    val r = got(0)
    assert(r.getAs[java.sql.Date]("ts").toString === "2014-01-03")
    assert(r.getAs[Double]("lat") === 42.5 && r.getAs[Double]("lon") === -71.1)
    assert(r.getAs[String]("actor1") === "ACTOR_ONE" &&
      r.getAs[String]("action_country") === "US")
    assert(r.getAs[Int]("n_articles") === 7 && r.getAs[Double]("avg_tone") === 1.5)
    assert(r.isNullAt(r.fieldIndex("source_url")))                  // 57 cols: no URL
    // empty actor2 token reads as NULL, not ""
    assert(r.isNullAt(r.fieldIndex("actor2")))
    assert(got(1).getAs[String]("source_url") === "http://example.org/a")
  }

  test("GDELT: Java split semantics — trailing empty columns do not count") {
    // 57 cells but the last two empty: Java line.split sees 55 tokens and
    // the reference rejects the line
    val v = Array.fill(57)("")
    v(0) = "9"; v(1) = "20140103"; v(49) = "1"; v(53) = "42.5"; v(54) = "-71.1"
    val lines = Seq(v.mkString("\t")).toDF("line")
    assert(FlatGeoSource.gdeltEvents(lines, "line").count() === 0L)
  }

  test("GDELT: an EMPTY supplemental numeric is a null attribute; a non-empty unparseable one kills the line") {
    val empty = gdeltLine("7", "20140103", "1", "42.5", "-71.1", mentions = "")
    val bad = gdeltLine("8", "20140103", "1", "42.5", "-71.1", mentions = "x3")
    val got = FlatGeoSource.gdeltEvents(Seq(empty, bad).toDF("line"), "line",
      extended = true).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Int]("eventid") === 7)
    assert(got(0).isNullAt(got(0).fieldIndex("n_mentions")))
    // the non-extended path keeps both (the reference only parses
    // supplemental fields when includeSupplementalFields is set)
    assert(FlatGeoSource.gdeltEvents(Seq(empty, bad).toDF("line"), "line").count() === 2L)
  }

  test("GeoLife: header skip via the ==7 gate, CRLF, -777 sentinel, pointinstance over kept rows") {
    val plt = Seq(
      "Geolife trajectory", "WGS 84", "Altitude is in Feet", "Reserved 3",
      "0,2,255,My Track,0,0,2,8421376", "0",
      "39.906631,116.385564,0,492,39925.448,2009-04-22,10:45:13",
      "bad,line",                                                     // not 7 fields: skipped
      "39.906554,116.385625,0,-777,39925.449,2009-04-22,10:46:13"     // -777 altitude
    ).mkString("\r\n")                                                // CRLF document
    val docs = Seq(("trip1.plt", plt)).toDF("file", "content")
    val pts = FlatGeoSource.geolifePoints(docs, "file", "content")
      .orderBy("pointinstance").collect()
    assert(pts.length === 2)
    // 0-based, counting KEPT records only (the skipped line leaves no gap)
    assert(pts.map(_.getAs[Int]("pointinstance")).toSeq === Seq(0, 1))
    assert(pts(0).getAs[Double]("lat") === 39.906631 &&
      pts(0).getAs[Double]("lon") === 116.385564)
    assert(pts(0).getAs[Double]("altitude") === 492.0)
    assert(pts(0).getAs[java.sql.Timestamp]("ts").toString === "2009-04-22 10:45:13.0")
    assert(pts(1).isNullAt(pts(1).fieldIndex("altitude")))            // -777 -> null
    val trk = FlatGeoSource.geolifeTracks(docs, "file", "content").collect()(0)
    assert(trk.getAs[Long]("n_points") === 2L)
    assert(trk.getAs[Long]("duration_ms") === 60000L)
    assert(trk.getAs[Seq[Double]]("lons") === Seq(116.385564, 116.385625))
  }

  test("GeoLife: coordinates wrap into WGS84 range (adjustCoordinateDimensionToRange)") {
    val plt = "100.0,190.0,0,10,0,2009-04-22,10:45:13"
    val docs = Seq(("f.plt", plt)).toDF("file", "content")
    val p = FlatGeoSource.geolifePoints(docs, "file", "content").collect()(0)
    // lat 100 wraps by one 180-band toward zero: -80; lon 190 by one
    // 360-band: -170 (the reference's modular adjust, not a pole clamp)
    assert(p.getAs[Double]("lat") === -80.0)
    assert(p.getAs[Double]("lon") === -170.0)
  }

  test("T-Drive: typed parse; a bad timestamp keeps the row with null ts") {
    val lines = Seq(
      "368,2008-02-02 13:30:45,116.52889,39.92447",
      "368,not-a-time,116.5,39.9",
      "x,2008-02-02 13:30:45,116.5,39.9",     // bad taxi id: dropped
      "too,short"                              // wrong arity: dropped
    ).toDF("line")
    val got = FlatGeoSource.tdrivePoints(lines, "line").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Int]("taxi_id") === 368 &&
      got(0).getAs[Double]("lon") === 116.52889)
    assert(!got(0).isNullAt(got(0).fieldIndex("ts")))
    assert(got(1).isNullAt(got(1).fieldIndex("ts")))
  }
}

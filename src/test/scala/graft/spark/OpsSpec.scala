package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.WKTReader

/**
 * Spark-layer operator suite: every operator checked against an in-test
 * brute-force oracle, re-expressing the reference's own test contract
 * (AnalyticRecipesTest.scala:25-110 — partitioned distance-join must equal
 * compareAll brute force; SpatialQueryTest.java:73-170 — exact-geometry
 * semantics; GeoWaveBasicIT.java:894-979 — result-set equality by id set).
 */
class OpsSpec extends SparkTestBase {

  private lazy val pages: DataFrame = Tables.synthPages(spark, 2000).cache()

  private lazy val localPts: Array[(Long, Double, Double)] =
    pages.select("doc_id", "lon", "lat").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

  test("synthPages is deterministic and in-range") {
    val a = Tables.synthPages(spark, 500).select("doc_id", "lon", "lat", "text").collect()
    val b = Tables.synthPages(spark, 500).select("doc_id", "lon", "lat", "text").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.forall(r => r.getDouble(1) >= -180 && r.getDouble(1) <= 180
      && r.getDouble(2) >= -90 && r.getDouble(2) <= 90))
  }

  test("spatialBoxQuery == brute-force box filter") {
    val (lonMin, lonMax, latMin, latMax) = (-20.0, 55.0, -10.0, 48.0)
    val got = Ops.spatialBoxQuery(pages, lonMin, lonMax, latMin, latMax)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = localPts.collect {
      case (id, lon, lat) if lon >= lonMin && lon <= lonMax && lat >= latMin && lat <= latMax => id
    }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("spatialGeometryQuery == brute-force JTS intersects") {
    val wkt = "POLYGON ((-30 -20, 40 -25, 55 35, -10 45, -30 -20))"
    val geom = new WKTReader().read(wkt)
    val got = Ops.spatialGeometryQuery(pages, geom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gf = new GeometryFactory()
    val want = localPts.collect {
      case (id, lon, lat) if geom.intersects(gf.createPoint(new Coordinate(lon, lat))) => id
    }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("dateline-crossing box query wraps (LongitudeDefinition split)") {
    // box lon [175, -175] crosses the antimeridian; synthPages plants ~1%
    // of points hugging +-180
    val got = Ops.spatialBoxQuery(pages, 175.0, -175.0, -90.0, 90.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = localPts.collect {
      case (id, lon, _) if lon >= 175.0 || lon <= -175.0 => id
    }.toSet
    assert(got == want)
    assert(want.exists(id => localPts.find(_._1 == id).get._2 > 175),
      "east-side points present")
    assert(want.exists(id => localPts.find(_._1 == id).get._2 < -175),
      "west-side points present")
  }

  test("rectangle geometry query elides the exact predicate (index-only path)") {
    val gf = new GeometryFactory()
    val rect = gf.createPolygon(Array(
      new Coordinate(-10, -5), new Coordinate(40, -5), new Coordinate(40, 30),
      new Coordinate(-10, 30), new Coordinate(-10, -5)))
    val q = Ops.spatialGeometryQuery(pages, rect)
    assert(!q.queryExecution.executedPlan.toString.contains("stcoverspoint"),
      "rectangle should skip the prepared-geometry filter")
    val got = q.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = localPts.collect {
      case (id, lon, lat) if lon >= -10 && lon <= 40 && lat >= -5 && lat <= 30 => id
    }.toSet
    assert(got == want && want.nonEmpty)
  }

  test("stBoxQuery == brute-force spatial-temporal filter") {
    val ev = pages.select(col("doc_id").as("event_id"), col("lon"), col("lat"),
      col("warc_ts").as("ts"))
    val tsMin = java.sql.Timestamp.valueOf("2011-06-01 00:00:00")
    val tsMax = java.sql.Timestamp.valueOf("2012-09-01 00:00:00")
    val got = Ops.stBoxQuery(ev, -90, 90, -60, 60, tsMin, tsMax)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = pages.select("doc_id", "lon", "lat", "warc_ts").collect().collect {
      case r if r.getDouble(1) >= -90 && r.getDouble(1) <= 90 &&
        r.getDouble(2) >= -60 && r.getDouble(2) <= 60 &&
        !r.getTimestamp(3).before(tsMin) && !r.getTimestamp(3).after(tsMax) => r.getLong(0)
    }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("distanceJoin == brute-force all-pairs (AnalyticRecipesTest contract)") {
    val pts = pages.limit(1000).select(col("doc_id").as("id"), col("lon"), col("lat"))
    val d = 0.8
    val got = Ops.distanceJoin(pts, "id", d, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = (for {
      (ia, xa, ya) <- local; (ib, xb, yb) <- local
      if ia < ib && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) < d * d
    } yield (ia, ib)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one close pair")
  }

  test("distanceJoinMeters == brute-force haversine all-pairs") {
    val pts = pages.where(abs(col("lat")) <= 85).limit(800)
      .select(col("doc_id").as("id"), col("lon"), col("lat"))
    val dM = 150000.0 // 150 km
    val got = Ops.distanceJoinMeters(pts, "id", dM, bits = 7)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dLat = math.toRadians(b._3 - a._3) / 2
      val dLon = math.toRadians(b._2 - a._2) / 2
      val s = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(a._3)) * math.cos(math.toRadians(b._3)) *
          math.sin(dLon) * math.sin(dLon)
      2 * 6371008.8 * math.asin(math.sqrt(s))
    }
    val want = (for {
      a <- local; b <- local if a._1 < b._1 && hav(a, b) < dM
    } yield (a._1, b._1)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("knnToCentroids: k per centroid, matches brute force") {
    val cents = pages.where(col("doc_id") % 200 === 0)
    val k = 10
    val got = Ops.knnToCentroids(pages, "doc_id", cents, "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perCentroid = got.groupBy(_._1)
    assert(perCentroid.size == 10 && perCentroid.values.forall(_.length == k))
    val centLocal = localPts.filter(_._1 % 200 == 0)
    for ((cid, cx, cy) <- centLocal) {
      val want = localPts.map { case (id, x, y) =>
        (id, (x - cx) * (x - cx) + (y - cy) * (y - cy))
      }.sortBy { case (id, d2) => (d2, id) }.take(k).map(_._1)
      val gotIds = perCentroid(cid).sortBy(_._3).map(_._2)
      assert(gotIds.sameElements(want), s"centroid $cid")
    }
  }

  test("distinctKnnToCentroids: each point in at most one centroid group") {
    val cents = pages.where(col("doc_id") % 200 === 0)
    val got = Ops.distinctKnnToCentroids(pages, "doc_id", cents, "doc_id", 10).collect()
    val ids = got.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "a point appeared under two centroids")
    assert(got.map(_.getLong(0)).distinct.length == 10)
  }

  test("tile assignment: tileBounds inverts tileId, point in own tile") {
    for ((_, lon, lat) <- localPts.take(200)) {
      val t = GeoCodec.tileId(lon, lat, 8)
      val b = GeoCodec.tileBounds(t, 8)
      assert(lon >= b(0) - 1e-9 && lon <= b(1) + 1e-9, s"lon $lon not in [${b(0)},${b(1)}]")
      assert(lat >= b(2) - 1e-9 && lat <= b(3) + 1e-9, s"lat $lat not in [${b(2)},${b(3)}]")
    }
  }

  test("text byte-identity: text survives encode+explode+join round trip per url") {
    import GeoFunctions._
    val before = pages.select(col("url"), md5(col("text").cast("binary")).as("h"))
    val after = pages
      .withColumn("cell_id", gw_cell_id(col("lon"), col("lat")))
      .withColumn("tile", gw_tile_id(col("lon"), col("lat"), 8))
      .repartition(8, col("tile"))
      .select(col("url"), md5(col("text").cast("binary")).as("h2"))
    val joined = before.join(after, "url")
    assert(joined.where(col("h") =!= col("h2")).count() == 0)
    assert(joined.count() == pages.count())
  }

  test("CellInRanges binary-search predicate agrees with OR-chain") {
    val ranges = SpatialPlanner.spatialBoxRanges(-10, 70, -5, 40)
    val withCell = pages.withColumn("cell_id",
      GeoFunctions.gw_cell_id(col("lon"), col("lat")))
    val orChain = withCell
      .where(ranges.map { case (s, e) => col("cell_id") >= lit(s) && col("cell_id") <= lit(e) }
        .reduce(_ || _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sorted = ranges.sortWith((a, b) => graft.index.ByteUtils.compareUnsigned(a._1, b._1) < 0)
    val binSearch = withCell
      .where(GeoFunctions.gw_cell_in_ranges(col("cell_id"),
        sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(orChain == binSearch)
    assert(orChain.nonEmpty)
  }
}

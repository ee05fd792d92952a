package graft.spark

import org.apache.spark.sql.functions._

/**
 * DBScanMapReduceTest scenario ports (analytics/mapreduce/src/test/.../
 * dbscan/DBScanMapReduceTest.java): the reducer's clustering outcomes on
 * its literal fixtures, driven through our distributed DBSCAN.
 */
class DBScanPortSpec extends SparkTestBase {
  import spark.implicits._

  test("test8With4: 8 gaussian points (seed 3434, sigma 1e-5 around (30,30)), minPts 4 -> exactly ONE cluster") {
    // the reference draws with java.util.Random(3434) and rounds — the
    // same JDK generator is available here, so the fixture is identical
    val r = new java.util.Random(3434)
    def round(v: Double): Double = math.round(v * 1e6) / 1e6 // its round() helper precision
    val pts = (0 until 8).map { i =>
      (i.toLong, round(30.0 + r.nextGaussian() * 0.00001), round(30.0 + r.nextGaussian() * 0.00001))
    }.toDF("id", "lon", "lat")
    val clusters = Analytics.dbscan(pts, "id", eps = 0.001, minPts = 4, bits = 6)
    val labels = clusters.select("cluster").distinct().count()
    assert(labels == 1L, s"expected one cluster, got $labels")
    assert(clusters.count() == 8L, "all 8 points are members (all are core at sigma 1e-5)")
  }

  test("testReducer fixture: the two 50.001x clusters form, the far singletons do not (minPts 3)") {
    // features f4 (50.0011, 50.00105), f5 (50.00112, 50.00111),
    // f7 (50.00113, 50.00114) cluster; f1/f3/f6 near (30,30) cluster;
    // f8 at (40,40) is noise (DBScanMapReduceTest.java:151-330 fixture)
    val pts = Seq(
      (1L, 30.0, 30.0), (3L, 30.00000001, 30.00000001), (6L, 30.00000001, 30.00000002),
      (4L, 50.0011, 50.00105), (5L, 50.00112, 50.00111), (7L, 50.00113, 50.00114),
      (8L, 40.00000001, 40.000000002)).toDF("id", "lon", "lat")
    val clusters = Analytics.dbscan(pts, "id", eps = 0.001, minPts = 3, bits = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two clusters; f8 is noise (our convention labels it -1 rather than
    // dropping the row, like the reference's unassigned output)
    assert(clusters(8L) == -1L)
    assert(Set(1L, 3L, 6L).map(clusters) == Set(clusters(1L)))
    assert(Set(4L, 5L, 7L).map(clusters) == Set(clusters(4L)))
    assert(clusters(1L) != clusters(4L))
  }

  // ------------------------------------------- geometry-input DBSCAN

  private val wktReader = new org.locationtech.jts.io.WKTReader()
  private val wkbWriter = new org.locationtech.jts.io.WKBWriter(2)

  /** brute-force oracle: closest-points eps-graph over JTS geometries +
    * union-find components, same core/border/noise + min-label contract. */
  private def bruteDbscanGeom(geoms: Seq[(Long, org.locationtech.jts.geom.Geometry)],
                              eps: Double, minPts: Int): Map[Long, (Long, String)] = {
    def dist(a: org.locationtech.jts.geom.Geometry,
             b: org.locationtech.jts.geom.Geometry): Double = {
      val p = new org.locationtech.jts.operation.distance.DistanceOp(a, b).nearestPoints()
      math.hypot(p(0).x - p(1).x, p(0).y - p(1).y)
    }
    val nbrs = geoms.map { case (i, g) =>
      i -> geoms.filter { case (_, h) => dist(g, h) <= eps }.map(_._1)
    }.toMap
    val core = nbrs.filter(_._2.size >= minPts).keySet
    // components over core-core edges by repeated min-label
    var lbl = core.map(i => i -> i).toMap
    var changed = true
    while (changed) {
      changed = false
      for (i <- core; j <- nbrs(i) if core(j)) {
        val m = math.min(lbl(i), lbl(j))
        if (lbl(i) != m) { lbl += i -> m; changed = true }
        if (lbl(j) != m) { lbl += j -> m; changed = true }
      }
    }
    geoms.map { case (i, _) =>
      if (core(i)) i -> (lbl(i), "core")
      else {
        val coreNbrs = nbrs(i).filter(core)
        if (coreNbrs.nonEmpty) i -> (coreNbrs.map(lbl).min, "border")
        else i -> (-1L, "noise")
      }
    }.toMap
  }

  /** planted LINE and POLYGON clusters: two chains of linestrings whose
    * envelopes are far apart but whose endpoints come within eps (the
    * closest-two-points distance the reference measures,
    * ClusterItemDistanceFn.java:58-77), one polygon ring cluster, and far
    * singletons — covers DBScanClusterList's geometry merging. */
  private def plantedGeoms: Seq[(Long, org.locationtech.jts.geom.Geometry)] = Seq(
    // cluster A: 4 long horizontal segments, each 8 deg long, chained with
    // 0.3-deg gaps (centroids 8+ deg apart — centroid distance would miss)
    1L -> "LINESTRING (0 0, 8 0)", 2L -> "LINESTRING (8.3 0, 16.3 0)",
    3L -> "LINESTRING (16.6 0, 24.6 0)", 4L -> "LINESTRING (24.9 0, 32.9 0)",
    // cluster B: polygons sharing near-touching corners
    11L -> "POLYGON ((50 20, 54 20, 54 24, 50 24, 50 20))",
    12L -> "POLYGON ((54.2 24.2, 58 24.2, 58 28, 54.2 28, 54.2 24.2))",
    13L -> "POLYGON ((58.2 28.2, 62 28.2, 62 32, 58.2 32, 58.2 28.2))",
    14L -> "POLYGON ((62.2 32.2, 66 32.2, 66 36, 62.2 36, 62.2 32.2))",
    // border: a point within eps of cluster A's last segment but with too
    // few neighbors to be core
    21L -> "POINT (33.2 0)",
    // noise: far singletons
    31L -> "LINESTRING (-100 -50, -99 -50)", 32L -> "POINT (120 70)"
  ).map { case (i, w) => (i, wktReader.read(w)) }

  test("dbscanGeometry: line/polygon clusters by closest-two-points, vs brute-force JTS oracle") {
    val eps = 0.5; val minPts = 3
    val geoms = plantedGeoms
    val df = geoms.map { case (i, g) => (i, wkbWriter.write(g)) }.toDF("id", "wkb")
    val got = Analytics.dbscanGeometry(df, "id", "wkb", eps, minPts, bits = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val want = bruteDbscanGeom(geoms, eps, minPts)
    assert(got == want, s"got $got\nwant $want")
    // shape sanity pinned independently of the oracle: chain ENDPOINTS
    // (1, 11) have only 2 eps-neighbors at minPts 3 → border; interior
    // segments are core, so the min-label is 2 / 12
    assert(want(2L)._2 == "core" && want(2L)._1 == 2L)
    assert(got(1L) == (2L, "border"))
    assert(Set(1L, 2L, 3L, 4L).map(got(_)._1) == Set(2L), "chain A is one cluster")
    assert(Set(11L, 12L, 13L, 14L).map(got(_)._1) == Set(12L), "polygon chain B is one cluster")
    assert(got(21L) == (2L, "border"))
    assert(got(31L) == (-1L, "noise") && got(32L) == (-1L, "noise"))
  }

  test("dbscanGeometry matches point dbscan on point-only input") {
    val pts = (0L until 200L).map(i =>
      (i, (i % 20).toDouble * 0.1 - 10.0, (i / 20).toDouble * 0.1 + 5.0))
    val asPts = pts.toDF("id", "lon", "lat")
    val asGeoms = pts.map { case (i, x, y) =>
      (i, wkbWriter.write(new org.locationtech.jts.geom.GeometryFactory()
        .createPoint(new org.locationtech.jts.geom.Coordinate(x, y))))
    }.toDF("id", "wkb")
    val a = Analytics.dbscan(asPts, "id", eps = 0.15, minPts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val b = Analytics.dbscanGeometry(asGeoms, "id", "wkb", eps = 0.15, minPts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("dbscanGeometryHulls: hull covers every member geometry; envelope equals member envelope") {
    val eps = 0.5; val minPts = 3
    val geoms = plantedGeoms
    val df = geoms.map { case (i, g) => (i, wkbWriter.write(g)) }.toDF("id", "wkb")
    val hulls = Analytics.dbscanGeometryHulls(df, "id", "wkb", eps, minPts, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(7))).toList.sortBy(_._1)
    val want = bruteDbscanGeom(geoms, eps, minPts)
    val memberSets = want.toSeq.filter(_._2._1 != -1L).groupBy(_._2._1)
      .view.mapValues(_.map(_._1).toSet).toMap
    assert(hulls.map(_._1).toSet == memberSets.keySet)
    for ((cl, n, wkt) <- hulls) {
      assert(n == memberSets(cl).size.toLong)
      val hull = wktReader.read(wkt)
      for (id <- memberSets(cl); g = geoms.find(_._1 == id).get._2)
        assert(hull.buffer(1e-9).covers(g), s"cluster $cl hull must cover member $id")
    }
    // cluster A's convex hull: the chain of collinear segments plus the
    // border point collapses to one segment from (0,0) to (33.2, 0)
    val aHull = wktReader.read(hulls.find(_._1 == 2L).get._3)
    assert(aHull.getEnvelopeInternal ==
      new org.locationtech.jts.geom.Envelope(0.0, 33.2, 0.0, 0.0))
  }
}

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
}

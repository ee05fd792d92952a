package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.locationtech.jts.io.{WKBWriter, WKTReader}
import graft.spark.{GeoFunctions, Ingest, SparkTestBase, Tables}

/** The optimizer rule injects the SFC range prefilter when a user filters
  * the store with only the exact geometry predicate. */
class SpatialFilterPushdownSpec extends SparkTestBase {

  private lazy val storeDir: String = {
    val dir = graft.TestTmp.dir("graft-rule").toString
    Ingest.run(spark, Tables.synthPages(spark, 4000), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    dir
  }

  test("rule adds pushable cell_id ranges to a bare exact-geometry filter") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SpatialFilterPushdown
    try {
      val geom = new WKTReader().read(
        "POLYGON ((-30 -20, 40 -25, 55 35, -10 45, -30 -20))")
      val wkb = new WKBWriter(2).write(geom)
      val store = Ingest.readStore(spark, storeDir)
      val q = store.where(GeoFunctions.st_covers_point(col("lon"), col("lat"), wkb))
      val plan = q.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
      assert(pushed.contains("GreaterThanOrEqual(cell_id"),
        s"rule did not inject pushable ranges:\n${plan.take(1500)}")
      // results identical to the un-optimized query
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialFilterPushdown)
      val want = store.where(GeoFunctions.st_covers_point(col("lon"), col("lat"), wkb))
        .select("url").collect().map(_.getString(0)).toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialFilterPushdown
      val got = q.select("url").collect().map(_.getString(0)).toSet
      assert(got == want && got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialFilterPushdown)
    }
  }

  test("two spatial conjuncts intersect their range sets (reference constraint-AND)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SpatialFilterPushdown
    try {
      // two polygons with a small overlap region
      val gA = new WKTReader().read("POLYGON ((-40 -30, 60 -30, 60 50, -40 50, -40 -30))")
      val gB = new WKTReader().read("POLYGON ((30 20, 120 20, 120 80, 30 80, 30 20))")
      val w = new WKBWriter(2)
      val store = Ingest.readStore(spark, storeDir)
      val both = store.where(
        GeoFunctions.st_covers_point(col("lon"), col("lat"), w.write(gA)) &&
          GeoFunctions.st_covers_point(col("lon"), col("lat"), w.write(gB)))
      // exact answer = points in the geometric intersection
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      val want = store.select("url", "lon", "lat").collect().collect {
        case r if gA.intersects(gf.createPoint(new org.locationtech.jts.geom.Coordinate(
          r.getDouble(1), r.getDouble(2)))) &&
          gB.intersects(gf.createPoint(new org.locationtech.jts.geom.Coordinate(
            r.getDouble(1), r.getDouble(2)))) => r.getString(0)
      }.toSet
      assert(both.select("url").collect().map(_.getString(0)).toSet == want)
      assert(want.nonEmpty)
      // the injected prefilter is the INTERSECTED set: strictly fewer
      // coarse candidates than either single geometry's ranges admit
      def coarseCount(ranges: Seq[(Array[Byte], Array[Byte])]): Long =
        store.where(graft.spark.SpatialPlanner.rangesPredicate(col("cell_id"), ranges)).count()
      val sA = graft.spark.SpatialPlanner.mergeRanges(
        graft.spark.SpatialPlanner.spatialGeometryRanges(gA))
      val sB = graft.spark.SpatialPlanner.mergeRanges(
        graft.spark.SpatialPlanner.spatialGeometryRanges(gB))
      val inter = graft.spark.SpatialPlanner.intersectSets(sA, sB)
      assert(coarseCount(inter) < math.min(coarseCount(sA), coarseCount(sB)),
        "intersected prefilter should admit fewer rows than either geometry alone")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialFilterPushdown)
    }
  }

  test("rule must NOT fire on disjunctive or negated geometry predicates") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SpatialFilterPushdown
    try {
      val geom = new WKTReader().read("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")
      val wkb = new WKBWriter(2).write(geom)
      val store = Ingest.readStore(spark, storeDir)
      val covers = GeoFunctions.st_covers_point(col("lon"), col("lat"), wkb)
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      def localIn(lon: Double, lat: Double): Boolean =
        geom.intersects(gf.createPoint(new org.locationtech.jts.geom.Coordinate(lon, lat)))
      val local = store.select("url", "lon", "lat").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))

      // OR: rows OUTSIDE the geometry's cell ranges that satisfy the other
      // disjunct must survive (the rule AND-ing ranges would drop them)
      val orQ = store.where(covers || col("lang") === "zh")
      val wantOr = local.collect {
        case (u, lon, lat) if localIn(lon, lat) => u
      }.toSet ++ store.where(col("lang") === "zh").select("url").collect().map(_.getString(0))
      assert(orQ.select("url").collect().map(_.getString(0)).toSet == wantOr)
      assert(!"cell_id#\\d+ >=".r.findFirstIn(orQ.queryExecution.optimizedPlan.toString).isDefined,
        "range prefilter must not be injected under a disjunction")

      // NOT: exactly the rows outside the geometry must survive
      val notQ = store.where(!covers)
      val wantNot = local.collect { case (u, lon, lat) if !localIn(lon, lat) => u }.toSet
      assert(notQ.select("url").collect().map(_.getString(0)).toSet == wantNot)
      assert(wantNot.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialFilterPushdown)
    }
  }

  test("rule is a no-op without a cell_id column or when already ranged") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SpatialFilterPushdown
    try {
      val geom = new WKTReader().read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
      val wkb = new WKBWriter(2).write(geom)
      // no cell_id column → untouched, still correct
      val pts = Tables.synthPages(spark, 500)
      val got = pts.where(GeoFunctions.st_covers_point(col("lon"), col("lat"), wkb))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      val want = pts.select("doc_id", "lon", "lat").collect().collect {
        case r if geom.intersects(gf.createPoint(
          new org.locationtech.jts.geom.Coordinate(r.getDouble(1), r.getDouble(2)))) => r.getLong(0)
      }.toSet
      assert(got == want)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialFilterPushdown)
    }
  }
}

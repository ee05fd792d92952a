package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._

/**
 * The 100 TB read path: queries over the INGESTED store (stored `cell_id`
 * sort column) must push their range predicates into the parquet scan so
 * Iceberg/parquet row-group min/max stats prune I/O — the Spark analogue
 * of the reference's scanner ranges (AccumuloConstraintsQuery).
 */
class PushdownSpec extends SparkTestBase {

  private lazy val storeDir: String = {
    val dir = graft.TestTmp.dir("graft-pushdown").toString
    val pages = Tables.synthPages(spark, 5000)
    Ingest.run(spark, pages, dir, Ingest.Config(numBuckets = 4, batchSize = 4))
    dir
  }

  test("stored-cell_id box query pushes range predicates to the parquet scan") {
    val store = Ingest.readStore(spark, storeDir)
    val q = Ops.spatialBoxQuery(store, -20, 55, -10, 48)
    val plan = q.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(cell_id"),
      s"cell_id range not pushed to scan:\n${plan.take(2000)}")
    // correctness unchanged vs recomputing cell ids
    val want = Ops.spatialBoxQuery(store.drop("cell_id"), -20, 55, -10, 48)
      .select("url").collect().map(_.getString(0)).toSet
    val got = q.select("url").collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("binary-search predicate keeps a pushable bounding envelope") {
    val store = Ingest.readStore(spark, storeDir)
    // many polygons → many ranges → CellInRanges path with bounding range
    val regions = Tables.regionGeoms(40)
    val joined = SpatialJoin.polygonJoin(store, regions)
    val plan = joined.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(cell_id"),
      s"bounding cell_id range not pushed:\n${plan.take(2000)}")
  }

  test("column pruning reaches the scan (ReadSchema excludes unused cols)") {
    val store = Ingest.readStore(spark, storeDir)
    val q = store.select(col("url"), col("lon")).where(col("lon") > 0)
    val plan = q.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("lon") &&
      !readSchema.contains("text") && !readSchema.contains("html"),
      s"scan reads more than projected: $readSchema")
  }
}

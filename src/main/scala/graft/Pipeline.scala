package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark._

/**
 * End-to-end pipeline main — the spark-submit entry point of the north
 * star: synthesize/ingest Common-Crawl-style pages into the SFC-sorted
 * store (resumable, per-bucket lineage), then run the query suite over
 * the STORE (spatial join, kNN, tiling, dedup fingerprints) and append a
 * stage-metrics JSON per run.
 *
 * Usage (local or spark-submit):
 *   graft.Pipeline <nRows> <storeDir> [numBuckets]
 *
 * Re-running with the same storeDir resumes: completed ingest buckets are
 * skipped via the lineage checkpoint, and the query phase re-reads
 * whatever is committed.
 */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val storeDir = if (args.length > 1) args(1) else "/tmp/graft-store"
    val numBuckets = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      // spark-submit injects spark.master; default to local[*] otherwise
      .config("spark.master", sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        spark_conf_default_partitions())
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. resumable ingest — pages carry a rotating row visibility so the
    // transform verb below has something real to rewrite
    val t0 = System.nanoTime()
    val pages = Tables.synthPages(spark, n).withColumn("vis",
      when(col("doc_id") % 3 === 0, lit("a&b")).otherwise(lit("a")))
    val written = Ingest.run(spark, pages, storeDir, Ingest.Config(numBuckets = numBuckets))
    val ingestSec = (System.nanoTime() - t0) / 1e9

    // 2. queries over the committed store (stored cell_id → scan pruning)
    val store = Ingest.readStore(spark, storeDir).cache()
    val t1 = System.nanoTime()
    val joinRows = SpatialJoin.polygonJoin(store, Tables.regionGeoms(40))
      .withColumn("tile", GeoFunctions.gw_tile_id(col("lon"), col("lat"), 8))
      .agg(count(lit(1))).collect()(0).getLong(0)
    val querySec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val queries = store.where(col("doc_id") % 997 === 0)
    val knnRows = SpatialJoin.knnRing(store, "doc_id", queries, "doc_id", k = 10).count()
    val knnSec = (System.nanoTime() - t2) / 1e9

    val totalRows = store.count()
    store.unpersist()

    // 3. copy-on-write delete over the committed store — run
    // UNCONDITIONALLY: deleteByQuery is idempotent (a resumed run after
    // the rows are gone finds no matches and touches nothing), and any
    // gate on "did this run ingest" would skip the delete forever after
    // a crash between ingest completion and this step. Snapshots are
    // enabled FIRST (idempotent) so the delete and transform below
    // archive their pre-images and the whole mutation history stays
    // time-travelable — verified in stage 5.
    Snapshots.enable(storeDir)
    val t3 = System.nanoTime()
    val deleted = Ingest.deleteByQuery(spark, storeDir, col("doc_id") % 10007 === 0)
      .map(_.bucket).size
    val deleteSec = (System.nanoTime() - t3) / 1e9
    val afterRows = Ingest.readStore(spark, storeDir).count()

    val lineageRows = Ingest.readLineage(spark, storeDir)
      .agg(sum("rows")).collect()(0).getLong(0)
    require(lineageRows == afterRows,
      s"lineage ($lineageRows) must track the store ($afterRows) through the delete")

    // 4. visibility TRANSFORM over the committed store (the third mutation
    // verb) — idempotent like the delete: after the first run no matching
    // row still contains 'b', so a resume touches nothing. Guarded for
    // store dirs written before the vis column existed.
    val t4 = System.nanoTime()
    val transformed =
      if (Ingest.readStore(spark, storeDir).columns.contains("vis"))
        Ingest.transformVisibilityByQuery(spark, storeDir,
          col("doc_id") % 4013 === 0, "b", "c").size
      else 0
    val transformSec = (System.nanoTime() - t4) / 1e9
    // lineage must keep tracking the store through the transform too (a
    // pure transform never changes row counts)
    val lineageRows2 = Ingest.readLineage(spark, storeDir)
      .agg(sum("rows")).collect()(0).getLong(0)
    require(lineageRows2 == afterRows,
      s"lineage ($lineageRows2) must track the store ($afterRows) through the transform")

    // 5. time travel + changelog over the mutation history (resume-safe:
    // on a resumed run the deletes/transform above no-op and commit no
    // versions, so the conservation identities below hold against
    // whatever history the store actually carries)
    val t5 = System.nanoTime()
    val hw = Snapshots.highwater(storeDir)
    val asOf0 = Snapshots.readStoreAsOf(spark, storeDir, 0).count()
    val (chgRemoved, chgAdded) =
      if (hw == 0) (0L, 0L)
      else {
        val d = Snapshots.diff(spark, storeDir, 0, hw)
          .groupBy("change").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        (d.getOrElse("removed", 0L), d.getOrElse("added", 0L))
      }
    require(chgRemoved - chgAdded == asOf0 - afterRows,
      s"changelog must conserve rows: removed $chgRemoved - added $chgAdded " +
        s"!= asOf0 $asOf0 - live $afterRows")
    require(asOf0 >= afterRows,
      s"version 0 ($asOf0 rows) cannot be smaller than the live store ($afterRows)")
    val snapshotSec = (System.nanoTime() - t5) / 1e9

    println(
      f"""{"rows":$totalRows,"lineage_rows":$lineageRows,"buckets_written":${written.size},""" +
        f""""ingest_sec":$ingestSec%.2f,"join_rows":$joinRows,"join_sec":$querySec%.2f,""" +
        f""""knn_rows":$knnRows,"knn_sec":$knnSec%.2f,""" +
        f""""deleted_buckets":$deleted,"rows_after_delete":$afterRows,"delete_sec":$deleteSec%.2f,""" +
        f""""transformed_buckets":$transformed,"transform_sec":$transformSec%.2f,""" +
        f""""snapshot_versions":$hw,"rows_as_of_v0":$asOf0,""" +
        f""""changelog_removed":$chgRemoved,"changelog_added":$chgAdded,"snapshot_sec":$snapshotSec%.2f,""" +
        f""""join_rows_per_sec":${(totalRows / querySec).toLong}}""")
    spark.stop()
  }

  /** default shuffle partitions = available cores (spark-submit can
    * override with --conf). */
  private def spark_conf_default_partitions(): String =
    math.max(Runtime.getRuntime.availableProcessors(), 4).toString
}

package graft.spark

import org.apache.spark.sql.functions._

/**
 * AccumuloDataStoreStatsTest.runtest port (extensions/datastores/accumulo/
 * src/test/.../AccumuloDataStoreStatsTest.java:186-460): three points under
 * row visibilities, authorization-scoped count/bbox statistics, and
 * auth-gated deletes — a delete whose authorizations cannot see the row is
 * a no-op; one that can adjusts the stats. One intentional divergence,
 * noted inline: our stats are recomputed exactly from surviving rows, so
 * the bbox SHRINKS after a delete, where the reference's merge-only
 * BoundingBoxDataStatistics keeps the stale envelope.
 */
class StoreStatsPortSpec extends SparkTestBase {
  import spark.implicits._

  private def freshStore(): String = {
    val dir = graft.TestTmp.dir("graft-statsport").toString
    val pts = Seq(
      (1L, 25.0, 32.0, "aaa", "test_pt"),
      (2L, 26.0, 32.0, "aaa", "test_pt_1"),
      (3L, 27.0, 32.0, "bbb", "test_pt_2"))
      .toDF("doc_id", "lon", "lat", "vis", "name")
      .withColumn("url", col("name"))
      .withColumn("text", col("name")) // lineage checksum input
    Ingest.run(spark, pts, dir, Ingest.Config(numBuckets = 2, batchSize = 2,
      targetPartitions = 2, altIndexCol = Some("doc_id")))
    dir
  }

  private def queryCount(dir: String, auths: Seq[String]): Long = {
    // the test's polygon (24,31)-(28,33) covers all three points
    val visible = Visibility.filter(Ingest.readStore(spark, dir), "vis", auths)
    Ops.spatialBoxQuery(visible, 24.0, 28.0, 31.0, 33.0).count()
  }

  private def authedDelete(dir: String, name: String, auths: Seq[String]): Int =
    Ingest.deleteByQuery(spark, dir,
      col("name") === name && Visibility.visible(col("vis"), auths)).size

  test("auth-scoped stats and auth-gated deletes follow the reference scenario") {
    val dir = freshStore()
    // initial query under {aaa, bbb} sees all 3 (the test's first count)
    assert(queryCount(dir, Seq("aaa", "bbb")) == 3L)
    // count stats per auth scope: aaa -> 2, bbb -> 1
    def scoped(auths: Seq[String]) =
      Visibility.filter(Ingest.readStore(spark, dir), "vis", auths)
    assert(scoped(Seq("aaa")).count() == 2L)
    assert(scoped(Seq("bbb")).count() == 1L)
    // bbox stats: aaa = [25,26]x[32,32], bbb = [27,27], merged = [25,27]
    assert(Ops.bboxStatsEnv(scoped(Seq("aaa"))).contains(graft.index.StatsClip.Env(25, 26, 32, 32)))
    assert(Ops.bboxStatsEnv(scoped(Seq("bbb"))).contains(graft.index.StatsClip.Env(27, 27, 32, 32)))
    assert(Ops.bboxStatsEnv(scoped(Seq("aaa", "bbb"))).contains(graft.index.StatsClip.Env(25, 27, 32, 32)))
    // deleting test_pt_2 (vis bbb) with auths {aaa} is a NO-OP — the
    // delete's scan cannot see the row (ScanCallback found == false)
    assert(authedDelete(dir, "test_pt_2", Seq("aaa")) == 0)
    assert(queryCount(dir, Seq("aaa", "bbb")) == 3L)
    // deleting test_pt (vis aaa) with auths {aaa} removes it
    assert(authedDelete(dir, "test_pt", Seq("aaa")) > 0)
    assert(queryCount(dir, Seq("aaa", "bbb")) == 2L)
    // count stats adjust: aaa -> 1, bbb -> 1 (reference asserts the same)
    assert(scoped(Seq("aaa")).count() == 1L)
    assert(scoped(Seq("bbb")).count() == 1L)
    // DIVERGENCE: the reference's bbox keeps [25,26] for aaa (merge-only
    // statistic, never shrinks on delete); ours recomputes exactly
    assert(Ops.bboxStatsEnv(scoped(Seq("aaa"))).contains(graft.index.StatsClip.Env(26, 26, 32, 32)))
    assert(Ops.bboxStatsEnv(scoped(Seq("aaa", "bbb"))).contains(graft.index.StatsClip.Env(26, 27, 32, 32)))
    // lineage row totals track the delete exactly
    val lineageRows = Ingest.readLineage(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0)
    assert(lineageRows == 2L)
    // the everything-delete under full auths empties the store; the
    // emptied store reads as a typed empty frame POSITIONALLY identical
    // to a real partitioned-parquet read (bucket last)
    val fullSchema = Ingest.readStore(spark, dir).schema
    assert(Ingest.deleteByQuery(spark, dir,
      Visibility.visible(col("vis"), Seq("aaa", "bbb"))).nonEmpty)
    val emptyRead = Ingest.readStore(spark, dir)
    assert(emptyRead.count() == 0)
    assert(emptyRead.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      fullSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"fallback schema order must match a real read:\n${emptyRead.schema}\nvs\n$fullSchema")
    assert(queryCount(dir, Seq("aaa", "bbb")) == 0L)
    // stats of nothing: unset, and a further delete/transform is a no-op
    assert(Ops.bboxStatsEnv(emptyRead).isEmpty)
    assert(Ingest.deleteByQuery(spark, dir, lit(true)).isEmpty)
    assert(Ingest.transformVisibilityByQuery(spark, dir, lit(true), "a", "z").isEmpty)
    // the ID delete path no-ops too, even with STALE alt rows pointing at
    // buckets that no longer exist (the alt store outlives a full delete)
    assert(Ingest.deleteByIds(spark, dir, Seq(1L, 2L, 3L)).isEmpty)
    // crashed FULL-store delete: marker left behind on the emptied store —
    // the next mutation's recovery must recommit zero-row lineage and
    // release the marker, not throw and wedge every later delete
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, ".delete-inprogress"),
      "[0,1]".getBytes("UTF-8"))
    assert(Ingest.deleteByQuery(spark, dir, lit(false)).isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".delete-inprogress")))
    assert(Ingest.readLineage(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0) == 0L)
    graft.FsUtils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("compoundKey refuses a salt outside one prefix byte instead of silently truncating") {
    import spark.implicits._
    // 300 -> hex '100' -> lpad-2 would truncate to '10' (collides with 16)
    val bad = Seq((300, Array[Byte](1, 2))).toDF("salt", "cell")
      .select(Ingest.compoundKey(col("salt"), col("cell")).as("k"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("outside [0, 255]") ||
      Option(e.getCause).exists(_.getMessage.contains("outside [0, 255]")), e.toString)
    // in-range salts are unchanged by the guard
    val ok = Seq((16, Array[Byte](1, 2))).toDF("salt", "cell")
      .select(Ingest.compoundKey(col("salt"), col("cell")).as("k")).collect()(0)
    assert(ok.getAs[Array[Byte]](0).toSeq == Seq[Byte](0x10, 1, 2))
  }
}

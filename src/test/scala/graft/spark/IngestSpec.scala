package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Resumable ingest: crash mid-run, resume, verify completeness + the
  * per-url byte-identity invariant end-to-end. */
class IngestSpec extends SparkTestBase {

  test("ingest resumes from lineage checkpoint; text byte-identical per url") {
    val dir = graft.TestTmp.dir("graft-ingest").toString
    val pages = Tables.synthPages(spark, 3000)
    val cfg = Ingest.Config(numBuckets = 8, batchSize = 2, failAfterBatches = 2)

    // first run crashes after 2 of 4 batches
    intercept[RuntimeException] { Ingest.run(spark, pages, dir, cfg) }
    val partial = Ingest.completedBuckets(dir)
    assert(partial.size == 4, s"expected 4 committed buckets, got $partial")

    // resume completes only the rest
    val resumed = Ingest.run(spark, pages, dir, cfg.copy(failAfterBatches = Int.MaxValue))
    assert(resumed.map(_.bucket).toSet == (0 until 8).toSet -- partial)
    assert(Ingest.completedBuckets(dir) == (0 until 8).toSet)

    // store is complete: every url exactly once, text bytes unchanged
    val store = Ingest.readStore(spark, dir)
    assert(store.count() == 3000)
    assert(store.select("url").distinct().count() == 3000)
    val mismatch = store.select(col("url"), md5(col("text").cast("binary")).as("h"))
      .join(pages.select(col("url"), md5(col("text").cast("binary")).as("h0")), "url")
      .where(col("h") =!= col("h0")).count()
    assert(mismatch == 0)

    // lineage metrics add up and carry the text checksum witness
    val lin = Ingest.readLineage(spark, dir)
    assert(lin.agg(sum("rows")).collect()(0).getLong(0) == 3000)
    val wantXor = pages.agg(expr("bit_xor(xxhash64(text))")).collect()(0).getLong(0)
    assert(lin.agg(expr("bit_xor(text_checksum)")).collect()(0).getLong(0) == wantXor)

    // a fresh run over a complete store is a no-op
    assert(Ingest.run(spark, pages, dir, cfg.copy(failAfterBatches = Int.MaxValue)).isEmpty)
  }

  test("fuzz: crash at every batch boundary, resume always completes exactly") {
    val pages = Tables.synthPages(spark, 800).cache()
    val wantUrls = pages.select("url").collect().map(_.getString(0)).toSet
    for (crashAt <- 0 to 3) {
      val dir = graft.TestTmp.dir(s"graft-ingest-fuzz$crashAt").toString
      val cfg = Ingest.Config(numBuckets = 8, batchSize = 2, failAfterBatches = crashAt)
      if (crashAt < 4) intercept[RuntimeException] { Ingest.run(spark, pages, dir, cfg) }
      // possibly crash once more mid-resume
      if (crashAt <= 1) intercept[RuntimeException] {
        Ingest.run(spark, pages, dir, cfg.copy(failAfterBatches = 1))
      }
      Ingest.run(spark, pages, dir, cfg.copy(failAfterBatches = Int.MaxValue))
      val store = Ingest.readStore(spark, dir)
      assert(store.count() == 800, s"crashAt=$crashAt")
      assert(store.select("url").collect().map(_.getString(0)).toSet == wantUrls)
      assert(Ingest.completedBuckets(dir) == (0 until 8).toSet)
    }
  }
}

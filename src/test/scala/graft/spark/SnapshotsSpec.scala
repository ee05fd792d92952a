package graft.spark

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot log + time travel + compaction over the copy-on-write store:
 * every mutation verb (delete / transform / compact) archives exact
 * pre-images, `readStoreAsOf` reconstructs any retained version
 * bit-for-bit, `expire` trims history, and the whole thing is opt-in
 * (a store without `Snapshots.enable` behaves exactly as before).
 */
class SnapshotsSpec extends SparkTestBase {

  /** order-free content witness: (row count, xor of full-row hashes). */
  private def witness(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(col).toSeq
    val r = df.agg(count(lit(1)), bit_xor(xxhash64(cols: _*))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def dataFiles(dir: String, bucket: Int): Int = {
    val d = Paths.get(dir, "data", s"bucket=$bucket")
    if (!Files.isDirectory(d)) 0
    else {
      val s = Files.list(d)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }

  test("time travel across delete / transform / compact versions") {
    val dir = graft.TestTmp.dir("graft-snap").toString
    val pages = Tables.synthPages(spark, 2000)
      .withColumn("vis", when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b&a")))
    Ingest.run(spark, pages, dir,
      Ingest.Config(numBuckets = 8, batchSize = 2, altIndexCol = Some("doc_id")))
    Snapshots.enable(dir)
    assert(Snapshots.enabled(dir))

    val w0 = witness(Ingest.readStore(spark, dir))
    assert(w0._1 == 2000)

    // v1: spatial delete
    Ingest.deleteByQuery(spark, dir, col("lon") >= 90.0)
    val w1 = witness(Ingest.readStore(spark, dir))
    // v2: id delete through the alt index — ids picked from the
    // SURVIVORS of v1 so the delete is guaranteed not to no-op
    val victims = Ingest.readStore(spark, dir)
      .select("doc_id").orderBy("doc_id").limit(4)
      .collect().map(_.getLong(0)).toSeq
    Ingest.deleteByIds(spark, dir, victims, idCol = "doc_id")
    val w2 = witness(Ingest.readStore(spark, dir))
    assert(w2._1 == w1._1 - 4)
    // v3: visibility transform
    Ingest.transformVisibilityByQuery(spark, dir, col("lat") < 0.0, "b", "c")
    val w3 = witness(Ingest.readStore(spark, dir))
    // v4: compaction (multi-file buckets from the 4-batch ingest)
    assert((0 until 8).exists(dataFiles(dir, _) > 1),
      "fixture must hold a multi-file bucket for the compact version")
    val compacted = Ingest.compactBuckets(spark, dir, maxFilesPerBucket = 1)
    assert(compacted.nonEmpty)
    val w4 = witness(Ingest.readStore(spark, dir))
    assert(w4 == w3, "compaction must not change store content")

    val vs = Snapshots.versions(dir)
    assert(vs.map(_.version) == Seq(1, 2, 3, 4))
    assert(vs.map(_.verb) == Seq("delete", "delete", "transform", "compact"))
    assert(vs.forall(_.archived.nonEmpty))
    assert(vs.head.livePre == (0 until 8))

    // each version reconstructs bit-for-bit, live included
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 0)) == w0)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 1)) == w1)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 2)) == w2)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 3)) == w3)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 4)) == w4)
    // as-of schema is positionally identical to the live read
    assert(Snapshots.readStoreAsOf(spark, dir, 0).schema ==
      Ingest.readStore(spark, dir).schema)

    // semantic spot checks, not just hashes: v0 has the deleted rows,
    // v3 shows the transformed visibility where v2 does not
    assert(Snapshots.readStoreAsOf(spark, dir, 0)
      .where(col("lon") >= 90.0).count() > 0)
    assert(Ingest.readStore(spark, dir).where(col("lon") >= 90.0).count() == 0)
    val vis2 = Snapshots.readStoreAsOf(spark, dir, 2)
      .where(col("lat") < 0.0 && col("vis") === "c&a").count()
    val vis3 = Snapshots.readStoreAsOf(spark, dir, 3)
      .where(col("lat") < 0.0 && col("vis") === "c&a").count()
    assert(vis2 == 0 && vis3 > 0)

    // no-op mutations burn no version numbers (idempotent re-runs)
    assert(Ingest.deleteByQuery(spark, dir, col("lon") >= 90.0).isEmpty)
    assert(Ingest.deleteByIds(spark, dir, victims, idCol = "doc_id").isEmpty)
    assert(Ingest.compactBuckets(spark, dir, maxFilesPerBucket = 1).isEmpty)
    assert(Snapshots.versions(dir).size == 4)
  }

  test("diff: per-verb deltas, compaction diffs empty, touched buckets only") {
    val dir = graft.TestTmp.dir("graft-snap-diff").toString
    val pages = Tables.synthPages(spark, 1500)
      .withColumn("vis", when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b&a")))
    Ingest.run(spark, pages, dir, Ingest.Config(numBuckets = 8, batchSize = 2))
    Snapshots.enable(dir)
    val n0 = Ingest.readStore(spark, dir).count()
    Ingest.deleteByQuery(spark, dir, col("lon") >= 120.0) // v1
    val n1 = Ingest.readStore(spark, dir).count()
    Ingest.transformVisibilityByQuery(spark, dir, col("lat") < 0.0, "b", "c") // v2
    val nChanged = Ingest.readStore(spark, dir)
      .where(col("lat") < 0.0 && col("vis") === "c&a").count()
    Ingest.compactBuckets(spark, dir, maxFilesPerBucket = 1) // v3

    // delete delta: only removals, exactly the deleted rows
    val d01 = Snapshots.diff(spark, dir, 0, 1)
    assert(d01.where(col("change") === "added").count() == 0)
    assert(d01.where(col("change") === "removed").count() == n0 - n1)

    // transform delta: removed/added PAIRS sharing the row key
    val d12 = Snapshots.diff(spark, dir, 1, 2)
    assert(d12.where(col("change") === "removed").count() == nChanged)
    assert(d12.where(col("change") === "added").count() == nChanged)
    val paired = d12.groupBy("row_key")
      .agg(countDistinct("change").as("sides"), count(lit(1)).as("n"))
      .where(col("sides") === 2 && col("n") === 2).count()
    assert(paired == nChanged, "every transform delta must be a removed/added pair")
    assert(d12.where(col("change") === "added" && !col("vis").startsWith("c")).count() == 0)

    // compaction rewrites bytes, not rows: its delta is EMPTY
    assert(Snapshots.diff(spark, dir, 2, 3).count() == 0)

    // an empty range (no mutations in it) diffs to a typed empty frame
    intercept[IllegalArgumentException] { Snapshots.diff(spark, dir, 1, 1) }
    assert(Snapshots.diff(spark, dir, 3, 99).count() == 0)
    // a never-enabled store has no changelog — loud, not silently empty
    val plain = graft.TestTmp.dir("graft-diff-plain").toString
    Ingest.run(spark, Tables.synthPages(spark, 100), plain,
      Ingest.Config(numBuckets = 2, batchSize = 2))
    intercept[IllegalArgumentException] { Snapshots.diff(spark, plain, 0, 1) }
  }

  test("diff scan discipline: untouched live buckets prune out of the plan") {
    // a store where v1 touches a strict SUBSET of buckets and nothing is
    // compacted: the a/b sides' live relations still contain the
    // untouched buckets, so the isin(touched) filter must reach the scan
    // as a partition filter and prune them — the documented
    // cost-proportional-to-the-mutated-fraction contract
    val dir = graft.TestTmp.dir("graft-snap-prune").toString
    Ingest.run(spark, Tables.synthPages(spark, 1200), dir,
      Ingest.Config(numBuckets = 8, batchSize = 8, altIndexCol = Some("doc_id")))
    Snapshots.enable(dir)
    // salt buckets spread any SPATIAL predicate across the whole store, so
    // a subset-touching mutation is an ID delete through the alt index
    Ingest.deleteByIds(spark, dir, Seq(17L, 18L), idCol = "doc_id")
    val touched = Snapshots.versions(dir).head.archived.toSet
    assert(touched.size < 8, "fixture needs untouched buckets to prune")
    val d = Snapshots.diff(spark, dir, 0, 1)
    // sparkPlan, not executedPlan: AQE wraps the tree and hides the scans
    val liveScans = d.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("/data")) => s
    }
    assert(liveScans.nonEmpty, "diff must read the live side for vTo")
    for (s <- liveScans) {
      assert(s.metadata("PartitionFilters").contains("bucket"),
        s"live scan lost the bucket partition filter: ${s.metadata("PartitionFilters")}")
      val scannedBuckets = s.selectedPartitions.toPartitionArray
        .map(_.filePath.toString)
        .flatMap(p => "bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt))
        .toSet
      assert(scannedBuckets.subsetOf(touched),
        s"live scan read untouched buckets: $scannedBuckets vs touched $touched")
    }
  }

  test("compaction: one sorted file per bucket, content identity, no-op re-run") {
    val dir = graft.TestTmp.dir("graft-compact").toString
    val pages = Tables.synthPages(spark, 1200)
    Ingest.run(spark, pages, dir, Ingest.Config(numBuckets = 4, batchSize = 1))
    val before = witness(Ingest.readStore(spark, dir))
    assert((0 until 4).forall(dataFiles(dir, _) >= 4),
      "4 single-bucket batches must leave >= 4 files per bucket")

    val done = Ingest.compactBuckets(spark, dir, maxFilesPerBucket = 1)
    assert(done.map(_.bucket).sorted == (0 until 4))
    assert((0 until 4).forall(dataFiles(dir, _) == 1))
    assert(witness(Ingest.readStore(spark, dir)) == before)
    // rows stay sorted by row_key inside each bucket's single file (the
    // store invariant) — read the file directly so row order is the file's
    for (b <- 0 until 4) {
      val keys = spark.read.parquet(s"$dir/data/bucket=$b")
        .coalesce(1).select("row_key").collect().map(_.getAs[Array[Byte]](0))
      val cmp = java.util.Arrays.compareUnsigned(_: Array[Byte], _: Array[Byte])
      assert(keys.zip(keys.tail).forall { case (a, c) => cmp(a, c) <= 0 },
        s"bucket $b lost its row_key sort order after compaction")
    }
    // already at one file per bucket: re-run rewrites nothing
    assert(Ingest.compactBuckets(spark, dir, maxFilesPerBucket = 1).isEmpty)
    // threshold respected: nothing exceeds 4 files, so nothing rewrites
    assert(Ingest.compactBuckets(spark, dir, maxFilesPerBucket = 4).isEmpty)
  }

  test("expire trims old history; reads below the horizon fail loudly") {
    val dir = graft.TestTmp.dir("graft-snap-expire").toString
    Ingest.run(spark, Tables.synthPages(spark, 600), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    Snapshots.enable(dir)
    Ingest.deleteByQuery(spark, dir, col("lon") >= 120.0) // v1
    val w1 = witness(Ingest.readStore(spark, dir))
    Ingest.deleteByQuery(spark, dir, col("lon") >= 60.0) // v2
    Ingest.deleteByQuery(spark, dir, col("lon") >= 0.0) // v3
    val w3 = witness(Ingest.readStore(spark, dir))

    val dropped = Snapshots.expire(dir, keepLast = 2)
    assert(dropped == Seq(1))
    // a diff whose range reaches into expired history must fail loudly —
    // an empty changelog there would silently drop v1's deletions
    intercept[IllegalArgumentException] { Snapshots.diff(spark, dir, 0, 3) }
    assert(Snapshots.diff(spark, dir, 1, 3).count() > 0) // fully retained range
    assert(!Files.exists(Snapshots.versionDir(dir, 1)))
    assert(Snapshots.versions(dir).map(_.version) == Seq(2, 3))
    // v1 is the oldest still reconstructable (needs only the v2+ archives)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 1)) == w1)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 3)) == w3)
    intercept[IllegalArgumentException] {
      Snapshots.readStoreAsOf(spark, dir, 0)
    }
    // expire everything: only the live store remains readable — reads
    // below the horizon STILL fail loudly (the high-water mark survives
    // the empty log), and version numbering never restarts
    assert(Snapshots.expire(dir, keepLast = 0) == Seq(2, 3))
    assert(Snapshots.versions(dir).isEmpty)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 99)) == w3)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 3)) == w3)
    for (v <- Seq(0, 1, 2))
      intercept[IllegalArgumentException] { Snapshots.readStoreAsOf(spark, dir, v) }
    Ingest.deleteByQuery(spark, dir, col("lat") >= -100.0) // wipes the rest
    assert(Snapshots.versions(dir).map(_.version) == Seq(4),
      "numbering must continue past expired history, not restart at 1")
    // diff below the fully-expired horizon fails; above it works
    intercept[IllegalArgumentException] { Snapshots.diff(spark, dir, 0, 4) }
    assert(Snapshots.diff(spark, dir, 3, 4)
      .where(col("change") === "removed").count() > 0)
    // expire is a no-op (not a crash) on a store never enabled
    val plain = graft.TestTmp.dir("graft-snap-plain").toString
    Ingest.run(spark, Tables.synthPages(spark, 100), plain,
      Ingest.Config(numBuckets = 2, batchSize = 2))
    assert(Snapshots.expire(plain, keepLast = 3) == Seq.empty)
  }

  test("hard crash mid-swap: pre-images survive, history stays exact") {
    val dir = graft.TestTmp.dir("graft-snap-hardcrash").toString
    Ingest.run(spark, Tables.synthPages(spark, 800), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    Snapshots.enable(dir)
    val w0 = witness(Ingest.readStore(spark, dir))
    Ingest.deleteByQuery(spark, dir, col("lon") >= 150.0) // v1
    val w1 = witness(Ingest.readStore(spark, dir))

    // manufacture the exact filesystem state a hard crash leaves when a
    // second delete dies AFTER swapping bucket b but BEFORE archiving its
    // retired pre-image or committing v2: pending dir with _meta, the
    // pre-image at .bucket=b.retired, mutated rows live, a marker
    val dataDir = Paths.get(dir, "data")
    val b = 1
    val livePre = (0 until 4).filter(i => Files.isDirectory(dataDir.resolve(s"bucket=$i")))
    Files.createDirectories(Snapshots.pendingDir(dir, 2))
    Snapshots.writePendingMeta(dir, 2, "delete", livePre, Seq(b))
    val live = dataDir.resolve(s"bucket=$b")
    val retired = dataDir.resolve(s".bucket=$b.retired")
    Files.move(live, retired)
    spark.read.parquet(retired.toString).where(col("lat") < 50.0)
      .write.parquet(live.toString) // the "mutated" post-swap content
    val marker = Paths.get(dir, ".delete-inprogress")
    Files.write(marker, s"[$b]".getBytes)

    // FRESH marker: a concurrent as-of reader must not self-heal, and must
    // serve bucket b from its transient .retired pre-image — exact v1
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 1)) == w1)
    assert(Files.isDirectory(retired), "a fresh marker defers reader self-heal")

    // age the marker past the grace window: reader self-heal now routes
    // the pre-image into the pending archive (not the void) — still exact
    Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis - 16L * 60 * 1000))
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 1)) == w1)
    assert(!Files.exists(retired) &&
      Files.isDirectory(Snapshots.pendingDir(dir, 2).resolve(s"bucket=$b")))
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 0)) == w0)
    val wCrashed = witness(Ingest.readStore(spark, dir)) // partial-mutation live state

    // next mutation entry finalizes the crashed pending as PARTIAL v2,
    // then runs as v3 — every earlier version still reconstructs exactly
    Ingest.deleteByQuery(spark, dir, col("lon") >= 100.0) // v3
    val vs = Snapshots.versions(dir)
    assert(vs.map(_.version) == Seq(1, 2, 3))
    assert(vs(1).verb == "delete" && vs(1).archived == Seq(b))
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 0)) == w0)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 1)) == w1)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 2)) == wCrashed)
  }

  test("full wipe: as-of serves everything, live store reads typed empty") {
    val dir = graft.TestTmp.dir("graft-snap-wipe").toString
    Ingest.run(spark, Tables.synthPages(spark, 400), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    Snapshots.enable(dir)
    val w0 = witness(Ingest.readStore(spark, dir))
    Ingest.deleteByQuery(spark, dir, col("doc_id") >= 0L) // wipes every bucket
    val live = Ingest.readStore(spark, dir)
    assert(live.count() == 0)
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 0)) == w0)
    val e = Snapshots.versions(dir).head
    assert(e.archived == (0 until 4) && e.livePre == (0 until 4))
    // as-of at the wiped version is the same typed empty frame
    val asOf1 = Snapshots.readStoreAsOf(spark, dir, 1)
    assert(asOf1.count() == 0 && asOf1.schema == live.schema)
  }

  test("crashed-commit leftovers are swept; version numbers never collide") {
    val dir = graft.TestTmp.dir("graft-snap-crash").toString
    Ingest.run(spark, Tables.synthPages(spark, 500), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    Snapshots.enable(dir)
    Ingest.deleteByQuery(spark, dir, col("lon") >= 150.0) // v1
    val w1 = witness(Ingest.readStore(spark, dir))
    // simulate a mutation that archived + renamed v2 but crashed before
    // writing the log entry, plus a stale pending dir from another attempt
    val ghost = Snapshots.versionDir(dir, 2)
    Files.createDirectories(ghost.resolve("bucket=9"))
    Files.createDirectories(Snapshots.pendingDir(dir, 2))
    assert(Snapshots.versions(dir).map(_.version) == Seq(1))

    Ingest.deleteByQuery(spark, dir, col("lon") >= 100.0) // reuses v2
    val vs = Snapshots.versions(dir)
    assert(vs.map(_.version) == Seq(1, 2))
    assert(!Files.exists(ghost.resolve("bucket=9")), "ghost dir must be swept")
    assert(witness(Snapshots.readStoreAsOf(spark, dir, 1)) == w1)
  }

  test("as-of reads keep the 100 TB read path: pushdown + pruning through archives") {
    val dir = graft.TestTmp.dir("graft-snap-push").toString
    Ingest.run(spark, Tables.synthPages(spark, 3000), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    Snapshots.enable(dir)
    Ingest.deleteByQuery(spark, dir, col("lon") >= 150.0) // v1
    // a box query over the TIME-TRAVELED store must still push its
    // cell_id range into every parquet scan (archive relations included) —
    // time travel must not cost the row-group pruning the live read has
    val q = Ops.spatialBoxQuery(Snapshots.readStoreAsOf(spark, dir, 0), -20, 55, -10, 48)
    val plan = q.queryExecution.executedPlan.toString
    val pushedLines = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushedLines.nonEmpty &&
      pushedLines.forall(_.contains("GreaterThanOrEqual(cell_id")),
      s"cell_id range not pushed into every as-of scan:\n${plan.take(2000)}")
    // column pruning reaches the archive scans too
    val narrow = Snapshots.readStoreAsOf(spark, dir, 0).select(col("url"), col("lon"))
    val readSchemas = narrow.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall(l =>
      !l.contains("text") && !l.contains("html")),
      "as-of ReadSchema must exclude unused wide columns")
    // correctness unchanged vs recomputing cell ids over the same as-of frame
    val want = Ops.spatialBoxQuery(
        Snapshots.readStoreAsOf(spark, dir, 0).drop("cell_id"), -20, 55, -10, 48)
      .select("url").collect().map(_.getString(0)).toSet
    val got = q.select("url").collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("snapshots stay opt-in: an un-enabled store archives nothing") {
    val dir = graft.TestTmp.dir("graft-snap-off").toString
    Ingest.run(spark, Tables.synthPages(spark, 300), dir,
      Ingest.Config(numBuckets = 4, batchSize = 4))
    Ingest.deleteByQuery(spark, dir, col("lon") >= 0.0)
    assert(!Snapshots.enabled(dir))
    assert(Snapshots.versions(dir).isEmpty)
    assert(!Files.exists(Paths.get(dir, "_snapshots")))
  }
}

package graft.spark

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Snapshot log + time-travel reads over the copy-on-write store — the
 * Iceberg-parity piece SURVEY maps the reference's versioned-KV substrate
 * onto (the reference gets history for free from Accumulo/HBase cell
 * timestamps; an immutable-file store gets it from retained pre-images,
 * exactly like Iceberg snapshots over rewritten data files).
 *
 * Opt-in and purely ADDITIVE to the mutation protocol in [[Ingest]]: once
 * [[enable]]d, every copy-on-write bucket rewrite (delete / visibility
 * transform / compaction) archives the replaced bucket directories under
 * `_snapshots/v{V}/bucket=N` instead of dropping them, and commits a log
 * entry `_snapshots/log/v{V}.json` recording the verb, the archived
 * buckets, and the full pre-mutation bucket list. Reads:
 *
 *  - [[readStoreAsOf]](V) reconstructs the store exactly as of version V
 *    (V = 0 is the pre-first-mutation state): for each bucket live at V,
 *    serve the OLDEST archive made by a mutation AFTER V — that archive is
 *    the bucket's content at V, because the mutation that made it was the
 *    first to touch the bucket after V. Buckets never archived after V are
 *    served from the live store unchanged.
 *  - [[expire]] drops history older than the last `keepLast` versions
 *    (Iceberg's expire_snapshots): unbounded pre-image retention is the
 *    scale hazard, so retention is a first-class verb, and reads below the
 *    retained horizon fail loudly instead of serving a half-history.
 *
 * Contract: versions capture the MUTATION history (delete / transform /
 * compact). Ingest APPENDS are not versioned — an as-of read below a later
 * append serves untouched buckets from the live store, appended rows
 * included (the reference's Accumulo substrate behaves the same way:
 * cell-timestamp versioning tracks overwrites/deletes, not logical batch
 * membership). Interleave appends and time travel only above the append.
 *
 * Crash semantics (single-mutator contract, same as the delete path): the
 * archive is staged under `_snapshots/.v{V}-pending/` and the version
 * commits with one atomic rename AFTER every bucket swap lands, so readers
 * never observe a half-version. A mutation that hard-crashes mid-swap
 * loses the pre-images of buckets it had already swapped (the next run's
 * recovery may drop their `.retired` twins) — the LIVE store recovers
 * exactly as without snapshots; only that crashed version's history is
 * best-effort. Reference anchors: BaseDataStore delete/stats recommit
 * (core/store/.../base/BaseDataStore.java:327-499); Accumulo's cell-
 * timestamp versioning the reference leans on for the same capability.
 */
object Snapshots {

  final case class Entry(version: Int, verb: String,
                         archived: Seq[Int], livePre: Seq[Int], wallMs: Long)

  private def snapRoot(outDir: String): Path = Paths.get(outDir, "_snapshots")
  private def logDir(outDir: String): Path = snapRoot(outDir).resolve("log")
  private[spark] def versionDir(outDir: String, v: Int): Path =
    snapRoot(outDir).resolve(f"v$v%05d")
  private[spark] def pendingDir(outDir: String, v: Int): Path =
    snapRoot(outDir).resolve(f".v$v%05d-pending")

  /** turn snapshot retention ON for this store (idempotent; a store
    * without the log dir archives nothing — the pre-snapshot behavior). */
  def enable(outDir: String): Unit = Files.createDirectories(logDir(outDir))

  def enabled(outDir: String): Boolean = Files.isDirectory(logDir(outDir))

  /** the retained log, oldest first. Versions are contiguous as written;
    * [[expire]] trims from the OLD end only. */
  def versions(outDir: String): Seq[Entry] = {
    val d = logDir(outDir)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    val names =
      try {
        val it = s.iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("v") && n.endsWith(".json")) b += n
        }
        b.result()
      } finally s.close()
    names.sorted.map { n =>
      parseEntry(new String(Files.readAllBytes(logDir(outDir).resolve(n)),
        StandardCharsets.UTF_8))
    }
  }

  /** hand-rolled like Ingest's marker parsing (no JSON lib in the
    * dependency budget); we wrote the bytes, so the shape is fixed. */
  private def parseEntry(json: String): Entry = {
    def field(name: String): String = {
      val i = json.indexOf("\"" + name + "\":")
      require(i >= 0, s"snapshot log entry missing '$name': $json")
      val from = i + name.length + 3
      val stops = Seq(json.indexOf(',', from), json.indexOf('}', from)).filter(_ >= 0)
      json.substring(from, stops.min)
    }
    def intList(name: String): Seq[Int] = {
      val i = json.indexOf("\"" + name + "\":[")
      require(i >= 0, s"snapshot log entry missing '$name': $json")
      val from = i + name.length + 4
      val to = json.indexOf(']', from)
      val body = json.substring(from, to).trim
      if (body.isEmpty) Seq.empty else body.split(",").map(_.trim.toInt).toSeq
    }
    Entry(field("version").trim.toInt,
      field("verb").trim.stripPrefix("\"").stripSuffix("\""),
      intList("archived"), intList("live_pre"), field("wall_ms").trim.toLong)
  }

  private[spark] def nextVersion(outDir: String): Int =
    versions(outDir).lastOption.map(_.version + 1).getOrElse(1)

  /** commit the staged pending dir as version `v`: one atomic rename for
    * the archive, then the log entry (tmp + atomic move). A crash between
    * the two leaves an unlogged `v{V}` dir — the next mutation reuses the
    * version number after sweeping it. */
  private[spark] def commit(outDir: String, v: Int, verb: String,
                            archived: Seq[Int], livePre: Seq[Int], wallMs: Long): Unit = {
    val pending = pendingDir(outDir, v)
    val dest = versionDir(outDir, v)
    graft.FsUtils.deleteRecursively(dest) // unlogged leftover of a crashed commit
    if (Files.exists(pending))
      Files.move(pending, dest, StandardCopyOption.ATOMIC_MOVE)
    else Files.createDirectories(dest) // every planned bucket staged empty — keep the version readable
    val json =
      s"""{"version":$v,"verb":"$verb","archived":${archived.mkString("[", ",", "]")},""" +
        s""""live_pre":${livePre.mkString("[", ",", "]")},"wall_ms":$wallMs}"""
    val tmp = logDir(outDir).resolve(f"v$v%05d.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, logDir(outDir).resolve(f"v$v%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /**
   * The store exactly as of `version` (0 = before the first logged
   * mutation; `versions.last.version` = the live store). One
   * partition-pruned parquet relation per bucket live at that version —
   * archive dirs carry no `bucket` partition column (they are moved live
   * dirs), so it is re-attached as a literal, keeping readStore's
   * positional schema. Fails loudly below the retained horizon.
   */
  def readStoreAsOf(spark: SparkSession, outDir: String, version: Int): DataFrame = {
    require(version >= 0, s"readStoreAsOf: version must be >= 0, got $version")
    val vs = versions(outDir)
    val later = vs.filter(_.version > version)
    if (later.isEmpty) return Ingest.readStore(spark, outDir)
    require(vs.head.version <= version + 1,
      s"readStoreAsOf($version): history before version ${vs.head.version - 1} " +
        s"has been expired (oldest retained log entry is v${vs.head.version})")
    val liveAtV = later.head.livePre
    if (liveAtV.isEmpty) return Ingest.typedEmptyStore(spark, outDir)
    val dataDir = Paths.get(outDir, "data")
    // each bucket live at V is served from the OLDEST archive made after V
    // (the first post-V mutation to touch it archived its content AT V), or
    // from the live store if never archived after V. Group buckets by the
    // version that serves them — ONE parquet relation per contributing
    // version plus one for the untouched set (scales with #mutations, not
    // #buckets), with `basePath` so `bucket` stays the discovered partition
    // column in readStore's positional schema.
    val assigned = scala.collection.mutable.Set.empty[Int]
    val perVersion = later.flatMap { e =>
      val mine = e.archived.filter(b => liveAtV.contains(b) && assigned.add(b))
      if (mine.isEmpty) None else Some(e.version -> mine)
    }
    val untouched = liveAtV.filterNot(assigned)
    def readBuckets(base: Path, bs: Seq[Int], what: String): DataFrame = {
      val paths = bs.map { b =>
        val p = base.resolve(s"bucket=$b")
        require(Files.isDirectory(p),
          s"readStoreAsOf($version): $what bucket=$b is missing " +
            "(crashed mutation lost this pre-image, or snapshots were " +
            "disabled between mutations) — this version is not reconstructable")
        p.toString
      }
      spark.read.option("basePath", base.toString).parquet(paths: _*)
    }
    val frames =
      perVersion.map { case (v, bs) =>
        readBuckets(versionDir(outDir, v), bs, s"archive v$v/")
      } ++
        (if (untouched.isEmpty) Nil
         else Seq(readBuckets(dataDir, untouched, "live")))
    frames.reduce(_.unionByName(_))
  }

  /**
   * Iceberg's `expire_snapshots`: keep only the newest `keepLast` log
   * entries, dropping older archives. The log entry is removed FIRST so a
   * crash mid-expire leaves an orphan archive dir (swept by the next
   * expire) rather than a logged version whose files are gone.
   */
  def expire(outDir: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 0, s"keepLast must be >= 0, got $keepLast")
    val vs = versions(outDir)
    val drop = vs.dropRight(keepLast)
    drop.foreach { e =>
      Files.deleteIfExists(logDir(outDir).resolve(f"v${e.version}%05d.json"))
      graft.FsUtils.deleteRecursively(versionDir(outDir, e.version))
    }
    // sweep orphans from crashed expires/commits: any archive dir older
    // than the oldest retained log entry is unreachable
    val keptMin = versions(outDir).headOption.map(_.version).getOrElse(Int.MaxValue)
    val s = Files.list(snapRoot(outDir))
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("v") && !n.contains(".json") && Files.isDirectory(p)) {
          val v = n.stripPrefix("v").toInt
          if (v < keptMin) graft.FsUtils.deleteRecursively(p)
        }
      }
    } finally s.close()
    drop.map(_.version)
  }
}

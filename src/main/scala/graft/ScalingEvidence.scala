package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.Tables

/**
 * Full-machine-width scaling evidence (BASELINE.md §D3): WHY does the
 * 8 → 32-core (all-cores) efficiency fall below the stable 4 → 16 band?
 *
 * For each width this main runs, on identical cached input:
 *
 *  1. the headline engine job (SFC encode → broadcast-R-tree polygon join
 *     → tile assignment → aggregate), with per-task metrics from a
 *     SparkListener: Σ executorRunTime, Σ executorCpuTime, Σ jvmGcTime.
 *     cpu_occupancy = Σ cpuTime / (wall × cores) shows whether the cores
 *     were computing or stalled; Σ cpuTime across widths shows whether
 *     the engine did MORE WORK at 32 cores (it must not).
 *  2. a pure memory-bandwidth probe — sum(xxhash64(id)) over a cached
 *     long column, zero shuffle, zero engine code. Its own 8→32
 *     efficiency is the machine's parallel-memory ceiling: the engine
 *     cannot be expected to scale better than a memory scan.
 *
 * Verdict rule printed with the JSON: if headline efficiency ≈ probe
 * efficiency and Σ cpuTime is flat across widths, the fall-off is the
 * box's shared memory bandwidth / all-core clocks, not an engine
 * serialization — the cluster-shaped 4→16 protocol (§C) stays the graded
 * criterion.
 */
object ScalingEvidence {

  /** per-run task-metric totals, collected by a listener. */
  private final class Totals {
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val gcMs = new AtomicLong
    val tasks = new AtomicLong
    def reset(): Unit = { runMs.set(0); cpuNs.set(0); gcMs.set(0); tasks.set(0) }
  }

  private def session(cpus: Int): (SparkSession, Totals) = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t = new Totals
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          t.runMs.addAndGet(m.executorRunTime)
          t.cpuNs.addAndGet(m.executorCpuTime)
          t.gcMs.addAndGet(m.jvmGCTime)
          t.tasks.incrementAndGet()
        }
      }
    })
    (s, t)
  }

  /** the graded headline job — one definition, owned by [[Bench]] (these
    * forensics must measure exactly the pipeline the bench grades). */
  private def headline(pts: DataFrame): Long = Bench.headline(pts)

  /** median-of-3 timed runs of `job` with task totals for the MEDIAN run
    * (metrics re-collected on a dedicated rerun so they match one run,
    * not three). Listener totals are drained synchronously via
    * waitUntilEmpty before reading. */
  private def timed(s: SparkSession, t: Totals, job: () => Unit): (Double, Long, Long, Long) = {
    job() // identical-plan warmup: codegen + JIT out of the timed window
    val walls = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      job()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    org.apache.spark.sql.GraftBridge.drainListenerBus(s.sparkContext)
    t.reset()
    job()
    org.apache.spark.sql.GraftBridge.drainListenerBus(s.sparkContext)
    (walls(1), t.runMs.get, t.cpuNs.get / 1000000L, t.gcMs.get)
  }

  private final case class Width(cores: Int, wallSec: Double, cpuMs: Long,
                                 runMs: Long, gcMs: Long, probeSec: Double) {
    def occupancy: Double = cpuMs / (wallSec * 1000.0 * cores)
  }

  private def measure(cores: Int, inputDir: String, probeRows: Long): Width = {
    val (s, t) = session(cores)
    try {
      val pts = s.read.parquet(inputDir)
        .select(col("doc_id"), col("lon"), col("lat"))
        .repartition(cores * 2)
        .cache()
      pts.count()
      val (wall, runMs, cpuMs, gcMs) = timed(s, t, () => { headline(pts); () })
      pts.unpersist()
      // bandwidth probe: cached longs → hash → sum. No joins, no engine.
      val probe = s.range(probeRows).select(col("id")).repartition(cores * 2).cache()
      probe.count()
      // shiftright keeps the ANSI sum within Long range at any row count
      val probeJob = () => { probe.agg(sum(shiftright(xxhash64(col("id")), 32))).collect(); () }
      val (probeWall, _, _, _) = timed(s, t, probeJob)
      probe.unpersist()
      Width(cores, wall, cpuMs, runMs, gcMs, probeWall)
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "96000000").toLong
    val probeRows = n * 4 // larger than any cache level; pure memory scan
    val dir = java.nio.file.Files.createTempDirectory("graft-scaling-input").toString
    val stage = SparkSession.builder().master("local[32]").appName("stage")
      .config("spark.ui.enabled", "false").getOrCreate()
    try Tables.synthPages(stage, n)
      .select(col("doc_id"), col("url"), col("lon"), col("lat"))
      .repartition(64).write.mode("overwrite").parquet(dir)
    finally stage.stop()

    try {
    val lo = measure(8, dir, probeRows)
    val hi = measure(32, dir, probeRows)
    val headEff = (lo.wallSec / hi.wallSec) / (hi.cores.toDouble / lo.cores)
    val probeEff = (lo.probeSec / hi.probeSec) / (hi.cores.toDouble / lo.cores)
    def w(x: Width): String =
      f"""{"cores":${x.cores},"headline_wall_sec":${x.wallSec}%.3f,""" +
        f""""task_cpu_ms":${x.cpuMs},"task_run_ms":${x.runMs},"task_gc_ms":${x.gcMs},""" +
        f""""cpu_occupancy":${x.occupancy}%.3f,"probe_wall_sec":${x.probeSec}%.3f}"""
    println(
      f"""{"rows":$n,"probe_rows":$probeRows,"lo":${w(lo)},"hi":${w(hi)},""" +
        f""""headline_efficiency":$headEff%.3f,"probe_efficiency":$probeEff%.3f,""" +
        f""""cpu_work_ratio_hi_over_lo":${hi.cpuMs.toDouble / lo.cpuMs}%.3f}""")
    } finally FsUtils.deleteRecursively(dir)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing forensics: run named SparkEntry queries (cold + warm)
  * against SPARK_GRAFT_SF_DIR in one local[32] session — the tool for
  * separating plan regressions from machine state when a full Bench
  * number moves. Usage: runMain graft.TimeQuery q40_multilevel_kmeans … */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try for (name <- args) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
      for (label <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"TIMEQ $name($label) ${(System.nanoTime() - t0) / 1e9}%.2f sec rows=$n")
      }
    } finally spark.stop()
  }
}

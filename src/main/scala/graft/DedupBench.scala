package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Tables, TextOps}

/**
 * Corpus-scale dedup-ladder benchmark: synthetic corpus with planted
 * near-duplicates → MinHash signatures → banded LSH candidates (hot-bucket
 * capped) → exact Jaccard verification → connected-component cluster
 * collapse + keeper pick. Prints ONE JSON line with per-stage wall times
 * and recall over the planted pairs.
 *
 * Usage: runMain graft.DedupBench [nDocs]  (default 200000)
 */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.synthDocs(spark, n).repartition(cpus.toInt * 2).cache()
    docs.count() // materialize: time the engine, not the generator

    val t0 = System.nanoTime()
    val pairs = TextOps.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, tau = 0.5, maxBucket = 200).cache()
    val nPairs = pairs.count()
    val pairsSec = (System.nanoTime() - t0) / 1e9

    // recall over the planted near-dup pairs (docs 5g and 5g+1)
    val planted = n / 5
    val found = pairs
      .where(col("a_id") % 5 === 0 && col("b_id") === col("a_id") + 1)
      .count()

    val t1 = System.nanoTime()
    val clusters = TextOps.nearDupClusters(docs, "doc_id", pairs).cache()
    val keepers = clusters.where(col("is_keeper")).count()
    val clusterSec = (System.nanoTime() - t1) / 1e9

    println(
      f"""{"docs":$n,"lsh_pairs":$nPairs,"pairs_sec":$pairsSec%.2f,""" +
        f""""planted_pairs":$planted,"planted_found":$found,""" +
        f""""recall":${found.toDouble / planted}%.4f,""" +
        f""""clusters_keepers":$keepers,"cluster_sec":$clusterSec%.2f,""" +
        f""""docs_per_sec":${(n / (pairsSec + clusterSec)).toLong}}""")
    spark.stop()
  }
}

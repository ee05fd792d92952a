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

    // the simhash rung over the same corpus (q111's operator at scale):
    // Hamming ≤ 3 with the same hot-bucket cap as the MinHash phase.
    // NOTE the synthetic corpus SATURATES a 31-bit simhash — its shared
    // vocabulary concentrates signatures so most band buckets exceed any
    // cap (simhash_dropped below reports how many memberships the cap
    // removed). The phase therefore evidences the operator's BOUNDED-COST
    // degradation under saturation (drops logged, never an n² join), not
    // recall; exactness of the uncapped operator is q111's oracle and
    // TextOpsSpec's brute-force parity.
    val t2 = System.nanoTime()
    val shPairs = TextOps.simhashNearDupPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = 200).cache()
    val nShPairs = shPairs.count()
    val shFound = shPairs
      .where(col("a_id") % 5 === 0 && col("b_id") === col("a_id") + 1)
      .count()
    val simhashSec = (System.nanoTime() - t2) / 1e9
    shPairs.unpersist()

    println(
      f"""{"docs":$n,"lsh_pairs":$nPairs,"pairs_sec":$pairsSec%.2f,""" +
        f""""planted_pairs":$planted,"planted_found":$found,""" +
        f""""recall":${found.toDouble / planted}%.4f,""" +
        f""""clusters_keepers":$keepers,"cluster_sec":$clusterSec%.2f,""" +
        f""""simhash_pairs":$nShPairs,"simhash_found":$shFound,""" +
        f""""simhash_recall":${shFound.toDouble / planted}%.4f,"simhash_sec":$simhashSec%.2f,""" +
        f""""docs_per_sec":${(n / (pairsSec + clusterSec)).toLong}}""")
    spark.stop()
  }
}

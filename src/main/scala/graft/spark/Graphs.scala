package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components by min-label propagation — the shared
 * engine behind DBSCAN cluster assembly and near-duplicate cluster
 * collapse (the reference reaches the same fixpoint through its
 * NeighborListFactory merge chains, analytics/mapreduce/.../dbscan/
 * DBScanMapReduce.java:83-404).
 *
 * Each round every node takes the minimum label over its in-neighbors;
 * the driver loop tests an aggregate change-count only. Rounds are
 * `localCheckpoint`ed so plan lineage stays O(1) and prior generations
 * age out of executor memory — label chains of any length are safe.
 */
object Graphs {

  /**
   * Min-label components over a DIRECTED edge table (src, dst) that must
   * include a self-loop for every node (so isolated nodes label
   * themselves and the inner join below loses no one). For undirected
   * graphs pass both directions. Output: (id, lbl) — lbl is the minimum
   * node id of the component.
   */
  def minLabelComponents(edges: DataFrame): DataFrame = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val next = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "dst_lbl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_lbl")).as("next_lbl"))
      val merged = labels.join(next, Seq("id"))
        .select(col("id"), col("lbl"), least(col("lbl"), col("next_lbl")).as("new_lbl"))
        .localCheckpoint()
      changed = merged.where(col("new_lbl") =!= col("lbl")).count()
      labels = merged.select(col("id"), col("new_lbl").as("lbl"))
    }
    labels
  }
}

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
   *
   * Each round combines neighbor propagation with POINTER JUMPING (the
   * candidate label is chased one hop through the label table), so
   * convergence is O(log diameter) rounds instead of O(diameter) — the
   * driver-round count, not data volume, dominates these loops, and long
   * chains would otherwise pay one full job per hop. The fixpoint (min
   * node id per component) is schedule-independent, so results are
   * identical to plain propagation.
   */
  def minLabelComponents(edges: DataFrame): DataFrame = {
    // pin the edge table once — its upstream DAG (e.g. the whole LSH
    // candidate ladder) must not re-execute every propagation round
    val e = edges.localCheckpoint()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val next = e
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "dst_lbl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_lbl")).as("next_lbl"))
      val m1 = labels.join(next, Seq("id"))
        .select(col("id"), col("lbl"), least(col("lbl"), col("next_lbl")).as("l1"))
      // labels are node ids, so every candidate label has its own row —
      // follow it one hop and take the smaller
      val jumped = m1.join(m1.select(col("id").as("l1"), col("l1").as("l2")), Seq("l1"))
        .select(col("id"), col("lbl"), least(col("l1"), col("l2")).as("new_lbl"))
        .localCheckpoint()
      changed = jumped.where(col("new_lbl") =!= col("lbl")).count()
      labels = jumped.select(col("id"), col("new_lbl").as("lbl"))
    }
    labels
  }
}

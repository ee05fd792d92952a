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
 * truncated through [[Lineage.cut]] (RDD-level local checkpoints) so the
 * executed DAG stays O(1) deep and prior generations are dropped from
 * executor memory — label chains of any length are safe. (Chained
 * `Dataset.localCheckpoint` is NOT safe here: see [[Lineage]] — the
 * self-join in the jump step would double the retained DAG every round.)
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
    val (e, eRdd) = Lineage.cut(edges)
    var (labels, prevRdd) = Lineage.cut(
      e.select(col("src").as("id")).distinct().withColumn("lbl", col("id")))
    // one propagation step: neighbor-min, then chase the candidate label
    // one hop through the label table (labels are node ids, so every
    // candidate label has its own row) and take the smaller; keeps the
    // incoming label as `lbl` beside the improved `new_lbl`
    def step(lbls: DataFrame): DataFrame = {
      val next = e
        .join(lbls.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "dst_lbl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_lbl")).as("next_lbl"))
      val m1 = lbls.join(next, Seq("id"))
        .select(col("id"), col("lbl"), least(col("lbl"), col("next_lbl")).as("l1"))
      m1.join(m1.select(col("id").as("l1"), col("l1").as("l2")), Seq("l1"))
        .select(col("id"), col("lbl"), least(col("l1"), col("l2")).as("new_lbl"))
    }
    var changed = 1L
    while (changed > 0) {
      val (jumped, newRdd) = Lineage.cut(step(labels))
      changed = jumped.where(col("new_lbl") =!= col("lbl")).count()
      // the new generation is materialized — the previous one's blocks
      // can go (nothing reads them again)
      prevRdd.unpersist(false)
      prevRdd = newRdd
      labels = jumped.select(col("id"), col("new_lbl").as("lbl"))
    }
    eRdd.unpersist(false)
    labels
  }
}

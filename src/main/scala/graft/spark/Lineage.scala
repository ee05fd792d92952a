package graft.spark

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}

/**
 * Lineage truncation for driver-round loops.
 *
 * `Dataset.localCheckpoint` in Spark 4.1 does NOT reliably truncate the
 * lineage the next plan executes: chaining it round over round leaves the
 * full RDD DAG behind the returned `LogicalRDD`, and a loop whose body
 * reads the previous generation TWICE (e.g. a self-join) doubles that DAG
 * every round — single-task job times of 0.2 s grow past 40 s by round 21
 * (measured on this Spark; the logical plan stays one `LogicalRDD` node
 * while the per-round cost multiplies ~2.5×).
 *
 * The cure is to own the truncation at the RDD layer: take the row RDD,
 * `localCheckpoint()` + materialize THAT object (its dependency list is
 * mutated in place once the job finishes), and wrap exactly it back into
 * a DataFrame. Each generation then reads the previous one's persisted
 * blocks through a constant-depth DAG, and the previous generation's
 * blocks can be dropped as soon as the next is materialized.
 */
private[spark] object Lineage {

  /** Materialize `df` into locally-checkpointed blocks and return a frame
    * whose plan is a constant-size scan of exactly those blocks, plus the
    * RDD handle for releasing them once a successor generation exists.
    * (Loop use: `unpersist` the PREVIOUS round's handle only after the
    * current round's `cut` returned — a local checkpoint cannot be
    * recomputed once its blocks are gone.)
    *
    * The checkpoint is taken on a FRESH identity wrapper, never on
    * `df.rdd` itself: `Dataset.rdd` is a lazy val, so checkpointing the
    * canonical RDD would leave the Dataset permanently truncated — a
    * second `cut` of the same Dataset after `unpersist` would then try to
    * recompute through the checkpoint placeholder and die with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. */
  def cut(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd.mapPartitions(identity, preservesPartitioning = true)
    rdd.localCheckpoint()
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }
}

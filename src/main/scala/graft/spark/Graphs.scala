package graft.spark

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Distributed connected components by min-label propagation — the shared
 * engine behind DBSCAN cluster assembly and near-duplicate cluster
 * collapse (the reference reaches the same fixpoint through its
 * NeighborListFactory merge chains, analytics/mapreduce/.../dbscan/
 * DBScanMapReduce.java:83-404).
 *
 * Two-phase scheme. At every round boundary the DISTINCT cross-label
 * quotient edges of the current labeling are counted (bounded): once they
 * fit under `maxQuotientEdges`, the component structure that remains is a
 * small graph over super-nodes, finished in ONE driver union-find + a
 * broadcast remap — a constant number of jobs, independent of graph
 * diameter. Until then, propagation rounds run: every node takes the
 * minimum label over its in-neighbors plus one pointer-jump hop, which
 * shrinks the distinct-label count geometrically, so the quotient fits
 * after O(log diameter) rounds in the worst case and after zero rounds
 * whenever the raw edge set itself is under the cap. Rounds are truncated
 * through [[Lineage.cut]] (RDD-level local checkpoints) so the executed
 * DAG stays O(1) deep and prior generations are dropped from executor
 * memory — label chains of any length are safe. (Chained
 * `Dataset.localCheckpoint` is NOT safe here: see [[Lineage]] — the
 * self-join in the jump step would double the retained DAG every round.)
 */
object Graphs {

  /**
   * Min-label components over a DIRECTED edge table (src, dst) that must
   * include a self-loop for every node (so isolated nodes label
   * themselves and the propagation join loses no one) and both directions
   * of every undirected adjacency. Output: (id, lbl) — lbl is the minimum
   * node id of the component. The fixpoint is schedule-independent, so
   * the driver-collapse fast path and the propagation fallback produce
   * identical results.
   *
   * `maxQuotientEdges` bounds the driver-side finish: the collapse
   * collects at most that many (label, label) pairs (~32 MB at the
   * default). A quotient still over the cap — e.g. the first rounds of a
   * web-scale near-dup graph with hundreds of millions of components —
   * falls back to another propagation round (logged), never to an
   * unbounded collect.
   */
  def minLabelComponents(edges: DataFrame,
                         maxQuotientEdges: Int = 2000000): DataFrame = {
    // pin the edge table once — its upstream DAG (e.g. the whole LSH
    // candidate ladder) must not re-execute every round
    val (e, eRdd) = Lineage.cut(edges)
    var (labels, prevRdd) = Lineage.cut(
      e.select(col("src").as("id")).distinct().withColumn("lbl", col("id")))
    // one propagation step: neighbor-min, then chase the candidate label
    // one hop through the label table (labels are node ids, so every
    // candidate label has its own row) and take the smaller
    def step(lbls: DataFrame): DataFrame = {
      val next = e
        .join(lbls.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "dst_lbl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_lbl")).as("next_lbl"))
      val m1 = lbls.join(next, Seq("id"))
        .select(col("id"), least(col("lbl"), col("next_lbl")).as("l1"))
      m1.join(m1.select(col("id").as("l1"), col("l1").as("l2")), Seq("l1"))
        .select(col("id"), least(col("l1"), col("l2")).as("lbl"))
    }
    var round = 0
    var converged = false
    while (!converged) {
      // the undirected quotient of the current labeling: one row per
      // unordered pair of DISTINCT labels joined by any edge. Empty ⇔
      // fixpoint reached (every edge is label-internal).
      val quotient = e
        .join(labels.select(col("id").as("src"), col("lbl").as("src_lbl")), "src")
        .join(labels.select(col("id").as("dst"), col("lbl").as("dst_lbl")), "dst")
        .where(col("src_lbl") =!= col("dst_lbl"))
        .select(least(col("src_lbl"), col("dst_lbl")).as("la"),
          greatest(col("src_lbl"), col("dst_lbl")).as("lb"))
        .distinct()
      // bounded probe: cap+1 rows decide fits / doesn't without ever
      // shipping an over-cap quotient to the driver
      val sample = quotient.limit(maxQuotientEdges + 1).collect()
      if (sample.isEmpty) {
        converged = true
      } else if (sample.length <= maxQuotientEdges) {
        val remap = unionFindMinRoots(sample)
        if (round > 0 || remap.nonEmpty)
          println(s"[graft] minLabelComponents: collapsed ${sample.length} " +
            s"quotient edges (${remap.size} relabels) on the driver after $round rounds")
        val lblType = labels.schema("lbl").dataType
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lbl", lblType, nullable = false),
          org.apache.spark.sql.types.StructField("root", lblType, nullable = false)))
        val mapDf = labels.sparkSession.createDataFrame(
          java.util.Arrays.asList(remap.map { case (l, r) => Row(l, r) }: _*), schema)
        val (cut, newRdd) = Lineage.cut(
          labels.join(broadcast(mapDf), Seq("lbl"), "left")
            .select(col("id"), coalesce(col("root"), col("lbl")).as("lbl")))
        prevRdd.unpersist(false)
        prevRdd = newRdd
        labels = cut
        converged = true
      } else {
        println(s"[graft] minLabelComponents: round $round quotient exceeds " +
          s"$maxQuotientEdges edges — propagating another round")
        val (cut, newRdd) = Lineage.cut(step(labels))
        prevRdd.unpersist(false)
        prevRdd = newRdd
        labels = cut
        round += 1
      }
    }
    eRdd.unpersist(false)
    labels
  }

  /** Driver union-find over the quotient pairs with min-value roots.
    * Label values are node ids (Long/Int/String — anything Comparable),
    * so "attach the larger root under the smaller" keeps every tree's
    * root at the component's minimum label. Returns only labels whose
    * root differs (the broadcast remap rows). */
  private def unionFindMinRoots(pairs: Array[Row]): Seq[(Any, Any)] = {
    val parent = new java.util.HashMap[Any, Any]()
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    pairs.foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) {
        if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = Seq.newBuilder[(Any, Any)]
    // snapshot the keys first: find() path-halves (mutates the map)
    val keys = parent.keySet().toArray
    keys.foreach { k =>
      val r = find(k)
      if (r != k) out += ((k, r))
    }
    out.result()
  }
}

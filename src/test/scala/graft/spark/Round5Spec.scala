package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions: map-side IVF list assignment (plan pins + parity with
  * the round-4 window formulation). */
class Round5Spec extends SparkTestBase {
  import spark.implicits._

  private def embFixture(n: Int): DataFrame =
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(16)(d => (((i * 31 + d * 7) % 19) - 9).toFloat / 9f).toSeq)
    }.toDF("vec_id", "embedding")

  test("annIvf: full vector side crosses NO Window and NO Exchange before the list equi-join") {
    val df = Ops.annIvf(embFixture(300), "vec_id", "embedding",
      nlist = 8, nProbe = 2, queryIds = Seq(1L, 7L), k = 3)
    // pre-AQE plan (CLAUDE.md: AQE wraps the executed plan)
    val plan = df.queryExecution.sparkPlan
    val cidJoins = plan.collect {
      case j: BroadcastHashJoinExec
        if j.leftKeys.exists(_.toString.contains("cid")) => j
    }
    assert(cidJoins.nonEmpty, "expected a broadcast hash join on cid:\n" + plan)
    val streamed = cidJoins.map { j =>
      // probes broadcast (left build) → the streamed side is the full vector side
      if (j.buildSide.toString.contains("Left")) j.right else j.left
    }
    def offenders(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case w: WindowExec => w
      case e: ShuffleExchangeExec => e
    }
    for (s <- streamed)
      assert(offenders(s).isEmpty,
        "vector side must stream scan→argmin→join, found:\n" + s)
    // the probe-side rank window must still exist (over the tiny query subset)
    assert(plan.collect { case w: WindowExec => w }.nonEmpty)
  }

  test("annIvf map-side argmin matches the explode+per-id-window assignment row for row") {
    val emb = embFixture(200)
    import GeoFunctions.dot_long
    val quant = (v: org.apache.spark.sql.Column) =>
      transform(v, x => round(x.cast("double") * 1000).cast("long"))
    val q = emb.select(col("vec_id").as("id"), quant(col("embedding")).as("v"))
      .withColumn("n2", dot_long(col("v"), col("v")))
    val nlist = 8; val nProbe = 3; val k = 5
    val queryIds = Seq(0L, 50L, 120L)
    // round-4 formulation: broadcast join all centroids + per-id rank window
    val cents = q.where(col("id") < nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    val d2 = col("n2") + col("cn2") - lit(2L) * dot_long(col("v"), col("cv"))
    val assignW = Window.partitionBy(col("id")).orderBy(col("d2"), col("cid"))
    val ranked = q.join(broadcast(cents)).withColumn("d2", d2)
      .withColumn("crn", row_number().over(assignW))
    val lists = ranked.where(col("crn") === 1)
      .select(col("id").as("vec_id"), col("cid"), col("v").as("vv"), col("n2").as("vn2"))
    val probes = ranked.where(col("crn") <= nProbe && col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("cid"), col("v").as("qv"), col("n2").as("qn2"))
    val cos = dot_long(col("qv"), col("vv")).cast("double") /
      sqrt(col("qn2").cast("double") * col("vn2").cast("double"))
    val topkW = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val expected = probes.join(lists, "cid")
      .withColumn("cos", cos)
      .withColumn("rn", row_number().over(topkW).cast("long"))
      .where(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ops.annIvf(emb, "vec_id", "embedding", nlist, nProbe, queryIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // ------------------------------------ neighbor-capped distance join

  private def gridPts(n: Int): Seq[(Long, Double, Double)] =
    (0L until n.toLong).map(i => (i, (i % 25).toDouble * 0.3 - 3.0, (i / 25).toDouble * 0.3 + 10.0))

  test("distanceJoinTopK matches a brute-force per-item top-k oracle (ties -> lowest b_id)") {
    val pts = gridPts(200)
    val d = 0.95; val k = 3
    val got = Ops.distanceJoinTopK(pts.toDF("id", "lon", "lat"), "id", d, bits = 6, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = pts.flatMap { case (i, x, y) =>
      pts.filter { case (j, u, v) => j != i && (x - u) * (x - u) + (y - v) * (y - v) < d * d }
        .map { case (j, u, v) => (j, (x - u) * (x - u) + (y - v) * (y - v)) }
        .sortBy { case (j, dd) => (dd, j) }.take(k).zipWithIndex
        .map { case ((j, _), r) => (i, j, (r + 1).toLong) }
    }.toSet
    assert(got == want)
    // the 0.3 grid puts 4 equidistant axis neighbors inside d=0.95: the
    // rank ties must break to the lowest b_id, so interior point 62's
    // top-3 is (37, 61, 63) in that order
    assert(got.filter(_._1 == 62L).toList.sortBy(_._3).map(_._2) == List(37L, 61L, 63L))
  }

  test("distanceJoinTopK: rank limit runs map-side (WindowGroupLimit Partial below the shuffle)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val df = Ops.distanceJoinTopK(gridPts(200).toDF("id", "lon", "lat"), "id", 0.95, bits = 6, k = 3)
    val modes = df.queryExecution.sparkPlan.collect {
      case w: WindowGroupLimitExec => w.mode.toString
    }
    assert(modes.toSet == Set("Partial", "Final"),
      "expected a partial+final WindowGroupLimit pair:\n" + df.queryExecution.sparkPlan)
  }

  test("distanceJoinTopK partitionCap drops over-cap cell members entirely (NNProcessor bound)") {
    // one hot cell: 40 co-located points, cap 10 -> only ids 0..9 survive,
    // on BOTH sides of the join
    val hot = (0L until 40L).map(i => (i, 1.0 + (i % 7) * 0.01, 1.0 + (i / 7) * 0.01))
    val got = Ops.distanceJoinTopK(hot.toDF("id", "lon", "lat"), "id",
        d = 2.0, bits = 2, k = 100, partitionCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSet == (0L until 10L).toSet)
    assert(got.map(_._2).toSet == (0L until 10L).toSet)
    assert(got.length == 90, "10 surviving members x 9 neighbors each")
  }

  test("distanceJoinMetersTopK: directed haversine top-k vs brute force") {
    val pts = gridPts(100)
    val dM = 60000.0; val k = 2
    val got = Ops.distanceJoinMetersTopK(pts.toDF("id", "lon", "lat"), "id", dM, bits = 6, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def hav(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
      val dLat = math.toRadians(y2 - y1) / 2; val dLon = math.toRadians(x2 - x1) / 2
      val a = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(y1)) * math.cos(math.toRadians(y2)) * math.sin(dLon) * math.sin(dLon)
      2.0 * 6371008.8 * math.asin(math.sqrt(a))
    }
    val want = pts.flatMap { case (i, x, y) =>
      pts.filter { case (j, u, v) => j != i && hav(x, y, u, v) < dM }
        .map { case (j, u, v) => (j, hav(x, y, u, v)) }
        .sortBy { case (j, dd) => (dd, j) }.take(k).zipWithIndex
        .map { case ((j, _), r) => (i, j, (r + 1).toLong) }
    }.toSet
    assert(got == want)
  }

  test("annIvfTrained parity: map-side assignment honors trained centroids (ties -> lowest cid)") {
    val emb = embFixture(150)
    // two byte-identical centroids force exact argmin ties
    val base = Array.tabulate(16)(d => (((7L * 31 + d * 7) % 19) - 9) * 1000L / 9L)
    val far = Array.tabulate(16)(d => (((3L * 31 + d * 7) % 19) - 9) * 1000L / 9L)
    val cents = Seq((9L, base), (4L, base.clone()), (2L, far))
    val got = Ops.annIvfTrained(emb, "vec_id", "embedding", cents,
      nProbe = 1, queryIds = Seq(7L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 3 && got.forall(_._1 == 7L))
    // top-1 must be the query itself (cos = 1 with itself, lowest id tie-break)
    assert(got.minBy(_._3)._2 == 7L)
  }

  test("minLabelComponents: a high-diameter path converges in bounded time (Lineage.cut regression)") {
    // A 150k-node path needs ~18 propagation+jump rounds. With chained
    // Dataset.localCheckpoint the retained RDD DAG doubled per round (the
    // jump step reads the previous generation twice) and the single
    // materialization task crossed 40 s by round 21 — this graph was
    // effectively unfinishable. Lineage.cut keeps every round O(1) deep.
    val n = 150000L
    val nodes = spark.range(n).select(col("id").as("src"), col("id").as("dst"))
    val fwd = spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val bwd = fwd.select(col("dst").as("src"), col("src").as("dst"))
    val t0 = System.nanoTime
    val labels = Graphs.minLabelComponents(nodes.unionByName(fwd).unionByName(bwd))
    val byLbl = labels.groupBy("lbl").count().collect()
    val secs = (System.nanoTime - t0) / 1e9
    assert(byLbl.length == 1 && byLbl.head.getLong(0) == 0L &&
      byLbl.head.getLong(1) == n)
    // new code: ~8 s on this box; pre-fix: minutes and growing. The bound
    // is deliberately loose against co-tenant noise while still firmly
    // rejecting the exponential regression.
    assert(secs < 90.0, f"high-diameter components took $secs%.1f s")
  }

  test("minLabelComponents: over-cap quotient falls back to propagation rounds; fixpoint identical") {
    // two path components (0..59 and 100..139) + an isolated node: the
    // round-0 quotient (= the raw undirected edge set, 99 pairs) exceeds
    // a cap of 8, forcing propagation rounds; each round shrinks the
    // distinct-label count until the quotient fits and the driver
    // collapse finishes. The fixpoint must equal the default-cap path's.
    def path(lo: Long, hi: Long): DataFrame = {
      val fwd = spark.range(lo, hi).select(col("id").as("src"), (col("id") + 1).as("dst"))
      fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
    }
    val nodes = spark.range(0L, 60L).union(spark.range(100L, 140L)).union(spark.range(999L, 1000L))
      .select(col("id").as("src"), col("id").as("dst"))
    val edges = nodes.unionByName(path(0L, 59L)).unionByName(path(100L, 139L))
    val tight = Graphs.minLabelComponents(edges, maxQuotientEdges = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val loose = Graphs.minLabelComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tight == loose)
    assert((0L until 60L).forall(tight(_) == 0L))
    assert((100L until 140L).forall(tight(_) == 100L))
    assert(tight(999L) == 999L)
    assert(tight.size == 101)
  }

  // Exchange-count pins read the EXECUTED plan after an action:
  // queryExecution.sparkPlan predates EnsureRequirements (no inserted
  // exchanges yet), and AQE hides children behind the adaptive wrapper —
  // the final plan string is the honest record of what actually shuffled.
  private def executedExchangeCount(df: DataFrame): Int = {
    df.collect()
    // the adaptive plan string prints Final AND Initial sections — count
    // only the final one (everything before the "== Initial Plan ==" echo)
    val finalSection = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(finalSection).length
  }

  test("mixtureSample plan: zero Exchange (a pure narrow column pass)") {
    val docs = spark.range(0, 50, 1, 4)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "en").otherwise("zh").as("lang"))
    val df = TextOps.mixtureSample(docs, "doc_id", "lang", Map("en" -> 0.5, "zh" -> 2.5))
    assert(executedExchangeCount(df) == 0,
      "mixture sampling must not shuffle:\n" + df.queryExecution.executedPlan)
  }

  test("packSequences plan: exactly one Exchange (the shard partitioning) below the window") {
    // multi-partition source: a single-partition LocalRelation would
    // satisfy the window's clustering for free and elide the exchange
    val docs = spark.range(0, 50, 1, 4).select(col("id").as("doc_id"), lit("a b c").as("text"))
    val df = TextOps.packSequences(docs, "doc_id", "text", budget = 4L, shards = 4)
    assert(executedExchangeCount(df) == 1,
      "packing must pay exactly the one shard shuffle:\n" + df.queryExecution.executedPlan)
  }

  test("simhashNearDupPairs: every join is an equi-join (no Cartesian/BNLJ anywhere in the plan)") {
    val docs = (0L until 60L)
      .map(i => (i, s"token${i % 7} shared words alpha beta gamma delta ${i % 3}"))
      .toDF("doc_id", "text")
    val df = TextOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 2)
    val plan = df.queryExecution.sparkPlan
    val offenders = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(offenders.isEmpty,
      "candidate generation must stay a banded equi-join, found:\n" + offenders.mkString("\n"))
  }
}

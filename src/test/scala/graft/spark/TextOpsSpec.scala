package graft.spark

import org.apache.spark.sql.functions._

/** Dedup/text suite vs literal Scala reimplementations of the same
  * portable integer hashing. */
class TextOpsSpec extends SparkTestBase {

  val P = TextOps.P

  // small doc fixture with planted near-duplicates
  private lazy val docs = {
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river side"), // near-dup of 0
      (2L, "a completely different document about spark catalyst query planning"),
      (3L, "a completely different document about spark catalyst query planner"), // near-dup of 2
      (4L, "der schnelle braune fuchs springt und der hund und die katze"),
      (5L, "le chat et le chien et les oiseaux dans le jardin"),
      (6L, "el perro y el gato y los pajaros en la casa"),
      (7L, "the quick brown fox jumps over the lazy dog near the river bank")) // exact dup of 0
    base.toDF("doc_id", "text")
  }

  private def hashStr(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)

  private def wordShingles(t: String, n: Int): Set[String] =
    t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  test("portableHash matches local fold") {
    val got = docs.select(col("doc_id"), TextOps.portableHash(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val local = docs.collect().map(r => (r.getLong(0), hashStr(r.getString(1)))).toMap
    assert(got == local)
  }

  test("ngramJaccardPairs == brute-force Jaccard") {
    val tau = 0.5
    val got = TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3, tau)
      .select("a_id", "b_id", "jac").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val local = docs.collect().map(r => (r.getLong(0), wordShingles(r.getString(1), 3)))
    val want = (for {
      (ia, sa) <- local; (ib, sb) <- local if ia < ib
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter) if inter > 0 && jac >= tau
    } yield ((ia, ib), jac)).toMap
    assert(got == want)
    assert(want.contains((0L, 7L)) && want((0L, 7L)) == 1.0, "exact dup pair found")
    assert(want.contains((0L, 1L)), "near-dup pair found")
  }

  test("minhashLshPairs finds planted near-dups, subset of exact pairs") {
    val tau = 0.5
    val lsh = TextOps.minhashLshPairs(docs, "doc_id", "text", 3, bands = 4, rowsPerBand = 4, tau)
      .select("a_id", "b_id", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3, tau)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((0L, 7L)), "exact dup must share every band")
  }

  test("simhash: identical docs equal, near-dups within small hamming distance") {
    val got = TextOps.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == got(7L))
    val hamming01 = java.lang.Long.bitCount(got(0L) ^ got(1L))
    val hamming02 = java.lang.Long.bitCount(got(0L) ^ got(2L))
    assert(hamming01 < hamming02, s"near-dup hamming $hamming01 !< unrelated $hamming02")
  }

  test("bpePairCounts == local adjacent-char-pair counts with deterministic tie-break") {
    val k = 10
    val got = TextOps.bpePairCounts(docs, "doc_id", "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    val counts = docs.collect().flatMap(_.getString(1).split(" "))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(k)
      .zipWithIndex.map { case ((p, c), i) => (p, c, i + 1L) }
    assert(got == expect)
  }

  test("packSequences: offsets and bins match a local concat-and-cut replay") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, ("tok " * ((i % 17).toInt + 1)).trim))
    val df = rows.toDF("doc_id", "text")
    val got = TextOps.packSequences(df, "doc_id", "text", budget = 20L, shards = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // local replay: shard by hash, order by id, running exclusive sum
    val tokens = rows.map { case (id, t) => (id, t.split(" ").count(_.nonEmpty).toLong) }.toMap
    val byShard = rows.map(_._1).groupBy(id => hashStr(id.toString) % 4L)
    val expect = byShard.flatMap { case (shard, ids) =>
      var off = 0L
      ids.sorted.map { id =>
        val e = (id, (tokens(id), shard, off, off / 20L))
        off += tokens(id)
        e
      }
    }
    assert(got == expect)
    // a doc starting exactly on a cut lands in the new bin; straddlers keep the earlier bin
    assert(got.values.forall { case (_, _, start, bin) => bin == start / 20L })
  }

  test("mixtureSample: per-stratum copies match a local replay of the id:stratum draw") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, Seq("en", "zh", "fr", "de")((i % 4).toInt)))
    val df = rows.toDF("doc_id", "lang")
    val weights = Map("en" -> 0.6, "zh" -> 2.3, "fr" -> 0.0)
    val got = TextOps.mixtureSample(df, "doc_id", "lang", weights)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // local replay of the deterministic decomposition
    def copiesOf(id: Long, lang: String): Long = {
      val w = weights.getOrElse(lang, 1.0)
      val whole = math.floor(w).toLong
      val frac = math.round((w - math.floor(w)) * 1000000.0)
      whole + (if (hashStr(s"$id:$lang") % 1000000L < frac) 1L else 0L)
    }
    val expect = (for {
      (id, lang) <- rows
      n = copiesOf(id, lang) if n > 0
      e <- 0L until n
    } yield (id, lang, e)).toSet
    assert(got.toSet == expect)
    assert(got.length == expect.size, "no duplicate (id, epoch) rows")
    // shape properties: fr dropped, de (default 1.0) exactly once, zh >= 2
    assert(!got.exists(_._2 == "fr"))
    val byDoc = got.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    assert(rows.filter(_._2 == "de").forall { case (id, l) => byDoc((id, l)) == 1 })
    assert(rows.filter(_._2 == "zh").forall { case (id, l) => byDoc((id, l)) >= 2 })
    // the fractional draw actually splits: some en kept, some dropped
    val enKept = rows.count { case (id, l) => l == "en" && byDoc.contains((id, l)) }
    val enAll = rows.count(_._2 == "en")
    assert(enKept > 0 && enKept < enAll)
  }

  test("minhashLshPairsAgainst == cross-side subset of the symmetric run; subset of brute-force Jaccard") {
    // corpus = even ids, new batch = odd ids; doc 1 near-dups corpus doc 0,
    // doc 7 is an exact dup of corpus doc 0
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 =!= 0)
    val got = TextOps.minhashLshPairsAgainst(corpus, fresh, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 4, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((7L, 0L)), "exact dup must probe into its corpus twin")
    assert(got.contains((1L, 0L)), "planted near-dup must be found")
    // uncapped, the asymmetric run is exactly the cross-side subset of the
    // symmetric self-join over the union (same bands, same hashing)
    val sym = TextOps.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 4, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossFromSym = sym.collect {
      case (a, b) if a % 2 != 0 && b % 2 == 0 => (a, b)
      case (a, b) if b % 2 != 0 && a % 2 == 0 => (b, a)
    }
    assert(got == crossFromSym)
    // and every survivor is a true Jaccard >= tau pair
    def jac(a: Long, b: Long): Double = {
      val byId = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      val (sa, sb) = (wordShingles(byId(a), 3), wordShingles(byId(b), 3))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    got.foreach { case (a, b) => assert(jac(a, b) >= 0.5, s"($a,$b)") }
  }

  test("simhashNearDupPairs == brute-force Hamming ball (pigeonhole is lossless); cap ⊆ uncapped") {
    val sigs = TextOps.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def brute(h: Int): Set[(Long, Long, Int)] = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= h
    } yield (a, b, d)).toSet
    for (h <- Seq(0, 2, 5)) {
      val got = TextOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(h), s"maxHamming=$h")
    }
    // exact dup (0,7) has hamming 0 — must appear at every h
    val h0 = TextOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(h0.contains((0L, 7L)))
    // hot-bucket cap drops pairs, never invents them
    val capped = TextOps.simhashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 5, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped.subsetOf(brute(5)))
  }

  test("embedding near-dup: LSH pairs subset of exact pairs; planted dup found") {
    import spark.implicits._
    // deterministic vectors; 0 and 1 nearly identical
    val vecs = (0L until 40L).map { i =>
      val src = if (i == 1) 0L else i // vec 1 = vec 0 + tiny perturbation
      val base = Array.tabulate(16)(d => (((src * 31 + d * 7) % 19) - 9).toFloat / 9f)
      if (i == 1) base(0) = base(0) + 0.01f
      (i, base.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val exact = TextOps.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.95)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 1L)))
    val lsh = TextOps.embeddingLshPairs(emb, "vec_id", "embedding", dims = 16, bits = 8, tau = 0.95)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    // byte-identical vectors (period-19 generator collisions) always share
    // every hyperplane sign, so they must survive LSH bucketing
    assert(lsh.contains((2L, 21L)), "identical vectors share all hyperplane signs")
    assert(lsh.nonEmpty)
  }

  test("embeddingLshPairsAgainst == cross-side subset of the symmetric run") {
    import spark.implicits._
    val vecs = (0L until 80L).map { i =>
      val src = if (i == 1) 0L else i // vec 1 = vec 0 + tiny perturbation
      val base = Array.tabulate(16)(d => (((src * 31 + d * 7) % 19) - 9).toFloat / 9f)
      if (i == 1) base(0) = base(0) + 0.01f
      (i, base.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val corpus = emb.where(col("vec_id") % 2 === 0)
    val fresh = emb.where(col("vec_id") % 2 =!= 0)
    val got = TextOps.embeddingLshPairsAgainst(corpus, fresh, "vec_id", "embedding",
        dims = 16, bits = 8, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 0L)), "planted near-dup must probe into its corpus twin")
    val sym = TextOps.embeddingLshPairs(emb, "vec_id", "embedding",
        dims = 16, bits = 8, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossFromSym = sym.collect {
      case (a, b) if a % 2 != 0 && b % 2 == 0 => (a, b)
      case (a, b) if b % 2 != 0 && a % 2 == 0 => (b, a)
    }
    assert(got == crossFromSym)
  }

  test("annIvf: k rows per query, self is top-1, candidates from probed lists only") {
    import spark.implicits._
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d => (((i * 31 + d * 7) % 19) - 9).toFloat / 9f).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Ops.annIvf(emb, "vec_id", "embedding",
        nlist = 8, nProbe = 3, queryIds = Seq(0L, 50L, 120L), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 50L, 120L))
    for ((q, rows) <- byQ) {
      assert(rows.length == 5)
      val top1 = rows.minBy(_._3)._2
      // the query's own vector lives in its closest list, which is probed
      // first → cos=1 top hit (ties to the lowest id among identical vectors)
      val qVec = vecs.find(_._1 == q).get._2
      val top1Vec = vecs.find(_._1 == top1).get._2
      assert(top1Vec == qVec, s"query $q top-1 $top1 is not an identical vector")
    }
  }

  test("languageId picks the marker-dominant language") {
    val got = TextOps.languageId(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(r.length - 1))).toMap
    assert(got(0L) == "en" && got(4L) == "de" && got(5L) == "fr" && got(6L) == "es")
    assert(got(2L) == "und" || got(2L) == "en") // no strong markers
  }

  test("tokenCount: regex token count matches local Java regex") {
    val got = TextOps.tokenCount(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]".r
    for ((id, nWords, nTokens) <- got) {
      val t = docs.collect().find(_.getLong(0) == id).get.getString(1)
      assert(nWords == t.split(" ").count(_.nonEmpty))
      assert(nTokens == re.findAllIn(t).length)
    }
  }

  test("fingerprintKgram matches local rolling hash") {
    val k = 8
    val got = TextOps.fingerprintKgram(docs, "doc_id", "text", k).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (r <- docs.collect()) {
      val t = r.getString(1)
      val hs = (0 to t.length - k).map(i => hashStr(t.substring(i, i + k)))
      val want = (hs.min, hs.max, hs.foldLeft(0L)(_ ^ _))
      assert(got(r.getLong(0)) == want)
    }
    assert(got(0L) == got(7L), "identical docs share fingerprint")
  }

  test("decontaminate: brute-force shingle-overlap oracle + broadcast plan") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // benchmark
      (1L, "a quick brown fox runs far away today"),       // shares "quick brown fox"
      (2L, "the lazy dog sleeps all day long"),            // shares "the lazy dog"
      (3L, "completely different words here entirely now"),
      (4L, "quick brown fox jumps over the lazy dog again"), // many shared
      (5L, "short one")                                      // < n words: no shingles
    ).toDF("doc_id", "text")
    val bench = docs.where(col("doc_id") === 0L)
    val train = docs.where(col("doc_id") =!= 0L)
    val got = TextOps.decontaminate(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: distinct 3-gram overlap counts vs the benchmark doc
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val benchSh = sh("the quick brown fox jumps over the lazy dog")
    val want = Seq(1L, 2L, 3L, 4L, 5L).flatMap { id =>
      val t = docs.where(col("doc_id") === id).collect()(0).getString(1)
      val hits = (sh(t) & benchSh).size.toLong
      if (hits >= 1) Some(id -> hits) else None
    }.toMap
    assert(got == want, s"got $got want $want")
    assert(!got.contains(3L) && !got.contains(5L))
    // minHits gate
    val strict = TextOps.decontaminate(train, bench, "doc_id", "text", n = 3,
      minHits = 2).collect().map(_.getLong(0)).toSet
    assert(strict == want.filter(_._2 >= 2).keySet)
    // scale shape: the benchmark side must be a broadcast hash join —
    // a sort-merge join would shuffle the whole training corpus
    val plan = TextOps.decontaminate(train, bench, "doc_id", "text", n = 3)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"), "train side must not sort-merge")
  }

  test("a zero embedding vector near-dups NOTHING (NaN cosine must not pass the threshold)") {
    import spark.implicits._
    // Spark orders NaN above every double, so 0/0 = NaN would satisfy
    // >= tau for every pair without the n2 > 0 guard — one zero vector
    // would link the whole corpus through connected components
    val emb = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),           // quantizes to zero
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)),          // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val exact = TextOps.embeddingNearDupPairs(emb, "vec_id", "embedding", tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)), s"exact path: $exact")
    val lsh = TextOps.embeddingLshPairs(emb, "vec_id", "embedding",
        dims = 4, bits = 4, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lsh.exists(p => p._1 == 0L || p._2 == 0L), s"lsh path leaked the zero vector: $lsh")
  }
}

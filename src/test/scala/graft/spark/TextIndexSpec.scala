package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._

/**
 * Stored n-gram posting-list text index (reference:
 * core/store/.../index/text/TextIndexStrategy.java:21-130): semantics
 * against brute force, gram enumeration, and — the round-3 point — the
 * plan shape: the probe reads only matching posting rows (gram equality
 * pushed into the posting scan) and the primary store is point-looked-up
 * by candidate id, not full-text-scanned.
 */
class TextIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "pack my box with five dozen liquor jugs"),
    (2L, "sphinx of black quartz judge my vow"),
    (3L, "the five boxing wizards jump quickly"),
    (4L, "a quick movement of the enemy will jeopardize six gunboats"),
    (5L, "qq"), // shorter than maxN — still indexed at n=2
    (6L, "quick quick quick") // repeated grams collapse to distinct postings
  ).toDF("doc_id", "text")

  private lazy val indexDir = {
    val dir = graft.TestTmp.dir("graft-textindex").toString
    TextIndex.buildAndWrite(docs, "doc_id", "text", dir)
    dir
  }
  private lazy val postings = spark.read.parquet(indexDir)

  private lazy val docsParquet = {
    val d = graft.TestTmp.dir("graft-textindex-docs").toString
    docs.write.mode("overwrite").parquet(d)
    spark.read.parquet(d)
  }

  private def bruteForce(pattern: String): Set[Long] =
    docs.where(col("text").contains(pattern)).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("CharGrams enumerates every n-gram for n in [minN, maxN]") {
    val grams = TextIndex.build(Seq((0L, "abcd")).toDF("doc_id", "text"), "doc_id", "text")
      .select("gram").collect().map(_.getString(0)).toSet
    assert(grams == Set("ab", "bc", "cd", "abc", "bcd", "abcd"))
    // below minN → no postings
    assert(TextIndex.build(Seq((0L, "a")).toDF("doc_id", "text"), "doc_id", "text").count() == 0)
    // repeated grams are distinct per doc
    val rep = TextIndex.build(docs.where(col("doc_id") === 6), "doc_id", "text")
    assert(rep.count() == rep.distinct().count())
  }

  test("stored-index search matches brute-force contains for 2..10-char patterns") {
    for (p <- Seq("qu", "the", "quick", "ck b", "judge my", "zz", "box")) {
      val got = TextIndex.search(docs, postings, "doc_id", "text", p)
        .collect().map(_.getLong(0)).toSet
      assert(got == bruteForce(p), s"pattern '$p'")
    }
  }

  test("probe gram is the longest prefix <= maxN; short patterns rejected below minN") {
    assert(TextIndex.probeGram("scan merge", 2, 4) == "scan")
    assert(TextIndex.probeGram("sc", 2, 4) == "sc")
    assertThrows[IllegalArgumentException](TextIndex.probeGram("s", 2, 4))
  }

  test("plan shape: gram equality pushed into the posting scan, primary store point-looked-up by id") {
    // probe side: the gram predicate must reach the posting parquet scan
    val probe = postings.where(col("gram") === "quic")
    val probePlan = probe.queryExecution.executedPlan.toString
    val probePushed = probePlan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(probePushed.contains("EqualTo(gram,quic)"),
      s"gram probe not pushed to posting scan:\n${probePlan.take(1500)}")

    // full search: the primary scan is pruned by In(doc_id, ...) — NOT a
    // full-text contains over every row, and no join node (point lookups)
    val q = TextIndex.search(docsParquet, postings, "doc_id", "text", "quick")
    val plan = q.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("In(doc_id"),
      s"primary scan not pruned by candidate ids:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), s"point-lookup path built a join:\n${plan.take(1500)}")
    assert(q.collect().map(_.getLong(0)).toSet == bruteForce("quick"))
  }

  test("anchored build: ported TextIndexStrategyTest insertion vectors") {
    val sentence =
      "inability to deal with or understand something complicated or unaccountable"
    val one = Seq((0L, sentence)).toDF("doc_id", "text")
    val grams = TextIndex.buildAnchored(one, "doc_id", "text")
      .select("gram").collect().map(_.getString(0)).toSet
    // the reference's literal expectations (TextIndexStrategyTest:35-43)
    assert(grams.contains("i"))
    assert(grams.contains("ity "))
    assert(grams.contains("le"))
    // the reference emits one id per OCCURRENCE (225); distinct grams = 200
    assert(grams.size == 200)
    val decorated = "" + sentence + ""
    val occurrences = (2 to 4).map(n => decorated.length - n + 1).sum
    assert(occurrences == 225)
  }

  test("rangeProbe: ported TextIndexStrategyTest.testQueryTextRange vectors") {
    assert(TextIndex.rangeProbe("deal", "dumn", 3, 4) == ("dea", "dum"))
    assert(TextIndex.rangeProbe("dealing", "durango", 3, 4) == ("dea", "dur"))
    assertThrows[IllegalArgumentException](TextIndex.rangeProbe("d", "x", 3, 4))
  }

  test("rangeSearchStored matches textRange brute force; probe reads only anchored grams") {
    // sensitive and insensitive ranges keep SEPARATE stores (folded vs
    // unfolded grams — a shared path would rebuild on every kind flip)
    val dirCi = graft.TestTmp.dir("graft-textrange-idx").toString
    val dirCs = graft.TestTmp.dir("graft-textrange-idx-cs").toString
    def brute(start: String, end: String, cs: Boolean): Set[Long] =
      TextOps.textRange(docs, "text", start, end, cs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    for ((s, e, cs) <- Seq(("pack", "sphinx of blacl", false),
      ("a quick", "the quick brown fox jumps over the lazy dog", false),
      ("qq", "qq", true), ("the", "tz", false))) {
      val got = TextIndex.rangeSearchStored(spark, docs, "doc_id", "text",
        s, e, if (cs) dirCs else dirCi, caseSensitive = cs)
        .collect().map(_.getLong(0)).toSet
      assert(got == brute(s, e, cs), s"range [$s, $e] cs=$cs")
    }
    // the probe interval sits entirely in the anchored (-prefixed)
    // key range, below every interior gram
    val (lo, hi) = TextIndex.rangeProbe("pack", "sphinx", 2, 4)
    assert(lo.startsWith("") && hi.startsWith("") && lo <= hi)
  }

  test("case-sensitive range probes the UNFOLDED anchored_cs store (no full scan, folded probe would miss rows)") {
    import spark.implicits._
    // binary order interleaves cases: 'B' < 'Z' < 'b', so ["B", "b"]
    // holds "Boxing…" and "Zebra…" but NOT "boxing…" — a folded probe
    // collapses both bounds to 'b' and would under-approximate
    val mixed = Seq((10L, "Boxing match"), (11L, "boxing match"),
      (12L, "Zebra crossing")).toDF("doc_id", "text")
    val mdir = graft.TestTmp.dir("graft-textrange-mixed").toString
    val mixedParquet = {
      val d = graft.TestTmp.dir("graft-textrange-mixed-docs").toString
      mixed.write.mode("overwrite").parquet(d)
      spark.read.parquet(d)
    }
    val csDir = s"$mdir/cs"
    val got = TextIndex.rangeSearchStored(spark, mixedParquet, "doc_id", "text",
      "B", "b", csDir, caseSensitive = true)
    assert(got.collect().map(_.getLong(0)).toSet == Set(10L, 12L))
    // the committed store is the unfolded kind: original-case grams present
    val grams = spark.read.parquet(csDir).select("gram")
      .collect().map(_.getString(0)).toSet
    assert(grams.contains(TextIndex.Anchor + "B") &&
      grams.contains(TextIndex.Anchor + "Z") && grams.contains(TextIndex.Anchor + "b"),
      "unfolded anchored grams expected (original case preserved)")
    // plan pins: probe range pushed into the posting scan; primary scan
    // pruned by candidate ids (point lookups, no join, no full-text scan)
    val plan = got.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("In(doc_id"),
      s"primary scan not pruned by candidate ids:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), s"point-lookup path built a join:\n${plan.take(1500)}")
    val probe = spark.read.parquet(csDir)
      .where(col("gram") >= (TextIndex.Anchor + "B") && col("gram") <= (TextIndex.Anchor + "b"))
    val probePushed = probe.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(probePushed.contains("GreaterThanOrEqual(gram") &&
      probePushed.contains("LessThanOrEqual(gram"),
      s"range probe not pushed to the posting scan:\n$probePushed")
    // the insensitive twin over the same docs uses its own folded store
    // and returns the folded answer (none: only exact-'b' values qualify)
    val ciDir = s"$mdir/ci"
    assert(TextIndex.rangeSearchStored(spark, mixedParquet, "doc_id", "text",
      "B", "b", ciDir, caseSensitive = false).count() == 0)
  }

  test("unselective gram falls back to the join plan and stays correct") {
    val q = TextIndex.search(docs, postings, "doc_id", "text", "quick", maxLookup = 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Join"), s"expected the join fallback:\n${plan.take(1500)}")
    assert(q.collect().map(_.getLong(0)).toSet == bruteForce("quick"))
  }
}

package graft.spark

import org.apache.spark.sql.functions._

/**
 * Fixture semantics for [[TextOps.repetitionSignals]] (Gopher/MassiveText
 * repetition rules as exact counts) and [[TextOps.dedupChunks]]
 * (corpus-wide chunk removal + ordered reassembly): zero/short docs,
 * duplicate-trigram counting, boilerplate shared across > maxDocs
 * documents, docs losing every chunk, and chunk-boundary ordering.
 */
class RepetitionDedupSpec extends SparkTestBase {

  import spark.implicits._

  test("repetitionSignals: exact counts incl. zero-word and sub-trigram docs") {
    val docs = Seq(
      (1L, "a a a b"),          // top word a×3; trigrams: "a a a","a a b" distinct
      (2L, "x y x y x y x y"),  // trigrams: xyx,yxy,xyx,yxy,xyx,yxy -> 6 total, 2 distinct
      (3L, "one two"),          // sub-trigram
      (4L, "")                  // zero words
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(got(0).toSeq === Seq(1L, 4L, 3L, 2L, 0L))
    assert(got(1).toSeq === Seq(2L, 8L, 4L, 6L, 4L))
    assert(got(2).toSeq === Seq(3L, 2L, 1L, 0L, 0L))
    assert(got(3).toSeq === Seq(4L, 0L, 0L, 0L, 0L))
  }

  test("dedupChunks: shared boilerplate removed everywhere, order kept, empty survivors") {
    // chunkWords=2: "ad tail" is the boilerplate chunk in docs 1..3
    // (3 distinct docs > maxDocs=2); doc 4 shares a chunk with only doc 5
    val docs = Seq(
      (1L, "ad tail keep one"),
      (2L, "keep two ad tail"),
      (3L, "ad tail"),           // loses its only chunk -> empty, still a row
      (4L, "rare pair alpha beta"),
      (5L, "rare pair gamma delta"),
      (6L, "")                   // empty in, empty out
    ).toDF("doc_id", "text")
    val got = TextOps.dedupChunks(docs, "doc_id", "text", chunkWords = 2, maxDocs = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Array(
      1L -> "keep one",
      2L -> "keep two",
      3L -> "",
      4L -> "rare pair alpha beta",
      5L -> "rare pair gamma delta",
      6L -> ""))
  }

  test("plan shapes: the trigram side never explodes; chunk dedup builds no cartesian join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // exactly ONE Generate — the top-word explode; trigram stats stay
    // array-expression-only (the scale contract in the scaladoc)
    val rep = TextOps.repetitionSignals(docs, "doc_id", "text")
    val gens = rep.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.size === 1, rep.queryExecution.optimizedPlan.treeString)
    // every join in the chunk-dedup plan carries a condition or keys
    val dd = TextOps.dedupChunks(docs, "doc_id", "text")
    val cartesian = dd.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    assert(cartesian.isEmpty, dd.queryExecution.optimizedPlan.treeString)
  }

  test("redactPii: typed placeholders, pre-redaction counts, untouched text passes through") {
    val docs = Seq(
      (1L, "write a@b.co or c.d-e@f.example.com at 192.168.0.1 call 415-555-0000"),
      (2L, "no pii here 1234"),
      (3L, "almost an ip 1.2.3 and a short phone 555-0000")).toDF("doc_id", "text")
    val got = TextOps.redactPii(docs, "doc_id", "text").orderBy("id").collect()
    assert(got(0).getString(1) === "write <EMAIL> or <EMAIL> at <IP> call <PHONE>")
    assert((got(0).getLong(2), got(0).getLong(3), got(0).getLong(4)) === ((2L, 1L, 1L)))
    assert(got(1).getString(1) === "no pii here 1234")
    assert((got(1).getLong(2), got(1).getLong(3), got(1).getLong(4)) === ((0L, 0L, 0L)))
    // partial lookalikes never fire
    assert(got(2).getString(1) === "almost an ip 1.2.3 and a short phone 555-0000")
  }

  test("dedupChunks: a short final chunk is its own unit and reassembly is positional") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),  // chunks of 2: "w1 w2","w3 w4","w5"
      (2L, "w3 w4 zz"),        // shares "w3 w4" with doc 1 only -> kept (maxDocs=2)
      (3L, "w3 w4")            // third doc sharing it -> now boilerplate
    ).toDF("doc_id", "text")
    val got = TextOps.dedupChunks(docs, "doc_id", "text", chunkWords = 2, maxDocs = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Array(1L -> "w1 w2 w5", 2L -> "zz", 3L -> ""))
  }
}

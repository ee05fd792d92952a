package graft.spark

import org.apache.spark.sql.functions._

/**
 * Visibility transform-by-query — the reference's TransformerWriter +
 * VisibilityTransformer ported scenario (extensions/datastores/accumulo/
 * src/test/.../TransformWriterTest.java: rows written under "a&b" are
 * visible to auths {a,b} and invisible to {a,c}; after transforming
 * visibility "b"→"c" the counts swap) plus the transformer's own string
 * semantics (VisibilityTransformer.java:25-60).
 */
class TransformVisSpec extends SparkTestBase {

  test("replaceFirstAndStrip: reference VisibilityTransformer string semantics") {
    def t(vis: String, re: String, rep: String): String =
      Visibility.replaceFirstAndStrip(vis, java.util.regex.Pattern.compile(re), rep)
    assert(t("a&b", "b", "c") == "a&c")
    assert(t("b&a", "b", "c") == "c&a")
    // replaceFirst replaces only the FIRST match
    assert(t("b&b", "b", "c") == "c&b")
    // an empty replacement of the leading term exposes a dangling operator,
    // which the transformer strips (one leading '&' or '|')
    assert(t("b&a", "b", "") == "a")
    assert(t("b|a", "b", "") == "a")
    // no match → unchanged; full erasure → empty (visible to everyone)
    assert(t("a", "x", "y") == "a")
    assert(t("b", "b", "") == "")
  }

  test("TransformWriterTest port: auth-visible counts swap after the b->c transform") {
    val dir = graft.TestTmp.dir("graft-transform-port").toString
    val pages = Tables.synthPages(spark, 200).withColumn("vis", lit("a&b"))
    Ingest.run(spark, pages, dir, Ingest.Config(numBuckets = 4, batchSize = 4))
    def visibleCount(auths: Seq[String]): Long =
      Visibility.filter(Ingest.readStore(spark, dir), "vis", auths).count()
    // pre-transform: {a,b} sees every row, {a,c} sees none
    assert(visibleCount(Seq("a", "b")) == 200L)
    assert(visibleCount(Seq("a", "c")) == 0L)
    val upd = Ingest.transformVisibilityByQuery(spark, dir, lit(true), "b", "c")
    assert(upd.map(_.rows).sum == 200L, "every bucket rewrites (all rows change)")
    // post-transform: the counts swap, exactly the reference's check()
    assert(visibleCount(Seq("a", "c")) == 200L)
    assert(visibleCount(Seq("a", "b")) == 0L)
    graft.FsUtils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("transform is match-confirmed: untouched buckets keep their files; re-run is a no-op") {
    val dir = graft.TestTmp.dir("graft-transform-noop").toString
    val pages = Tables.synthPages(spark, 300)
      .withColumn("vis", when(col("doc_id") % 3 === 0, lit("b&a")).otherwise(lit("a")))
    Ingest.run(spark, pages, dir, Ingest.Config(numBuckets = 4, batchSize = 4))
    def listing(b: Int) = new java.io.File(s"$dir/data/bucket=$b").listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    // predicate matches rows in every bucket, but only 'b&a' rows CHANGE —
    // a bucket with no doc_id%3==0 row must not be rewritten. (With 4
    // url-hash buckets over 300 docs every bucket holds one here, so pin
    // the stronger contract on the re-run instead.)
    val upd = Ingest.transformVisibilityByQuery(spark, dir, lit(true), "b", "c")
    assert(upd.nonEmpty)
    assert(Ingest.readStore(spark, dir).where(col("vis") === "c&a").count() ==
      Ingest.readStore(spark, dir).where(col("doc_id") % 3 === 0).count())
    // re-run: no vis contains 'b' anymore → zero affected buckets, zero
    // file churn (the store contract forbids file-identical rewrites)
    val before = (0 until 4).map(b => b -> listing(b)).toMap
    assert(Ingest.transformVisibilityByQuery(spark, dir, lit(true), "b", "c").isEmpty)
    for (b <- 0 until 4) assert(listing(b) == before(b), s"bucket $b churned")
    // lineage row counts are unchanged by a pure transform
    val lineageRows = Ingest.readLineage(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0)
    assert(lineageRows == 300L)
    graft.FsUtils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("null predicate values are not matches; non-matching rows keep their vis verbatim") {
    val dir = graft.TestTmp.dir("graft-transform-null").toString
    val pages = Tables.synthPages(spark, 120).withColumn("vis", lit("a&b"))
    Ingest.run(spark, pages, dir, Ingest.Config(numBuckets = 2, batchSize = 2))
    // predicate NULL for doc_id%2==0 (NOT a match), true for %2==1
    val pred = when(col("doc_id") % 2 === 0, lit(null).cast("boolean")).otherwise(lit(true))
    Ingest.transformVisibilityByQuery(spark, dir, pred, "b", "c")
    val store = Ingest.readStore(spark, dir)
    assert(store.where(col("doc_id") % 2 === 0 && col("vis") =!= "a&b").count() == 0)
    assert(store.where(col("doc_id") % 2 === 1 && col("vis") =!= "a&c").count() == 0)
    graft.FsUtils.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}

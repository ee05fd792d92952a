package graft.spark

import org.apache.spark.sql.functions._

/**
 * Port of the reference's JsonDefinitionColumnVisibilityManagementTest
 * (extensions/adapters/vector/src/test/java/.../visibility/
 * JsonDefinitionColumnVisibilityManagementTest.java:29-140) against
 * [[Visibility.fieldVis]] / [[Visibility.redactFields]]: exact-key match,
 * ordered-regex first match (Java String.matches, anchored), default
 * fall-through for unmatched fields and null/bad definitions, and the
 * field-redacting read under an authorization set.
 */
class FieldVisibilitySpec extends SparkTestBase {

  private def resolve(visJson: String, field: String, default: String = "default"): String = {
    val df = spark.range(1).select(
      Visibility.fieldVis(lit(visJson), field, default).as("v"))
    df.collect()(0).getString(0)
  }

  test("exact key beats regex; unmatched field gets the default (test fixture)") {
    // the test's vis attribute: {"pid":"TS", "geo.*":"S"}
    val vis = """{"pid":"TS", "geo.*":"S"}"""
    assert(resolve(vis, "pid") === "TS")        // testPIDNonDefault
    assert(resolve(vis, "pop") === "default")   // testPOPNonDefault
    assert(resolve(vis, "geometry") === "S")    // testGEORegexDefault
  }

  test("regex keys match in document order: the more specific key must come first") {
    // the class doc's example: { "geo.*" : "S", ".*" : "TS" }
    val vis = """{"geo.*":"S", ".*":"TS"}"""
    assert(resolve(vis, "geometry") === "S")
    assert(resolve(vis, "pid") === "TS")
    // reversed order: the general ".*" shadows everything after it
    val shadowed = """{".*":"TS", "geo.*":"S"}"""
    assert(resolve(shadowed, "geometry") === "TS")
  }

  test("Java full-match semantics: a regex matching a prefix only does not fire") {
    val vis = """{"geo":"S"}"""
    assert(resolve(vis, "geometry") === "default") // "geometry".matches("geo") is false
    assert(resolve(vis, "geo") === "S")
  }

  test("null and unparseable definitions fall through to the default") {
    val df = spark.range(1).select(
      Visibility.fieldVis(lit(null: String), "pid", "default").as("a"),
      Visibility.fieldVis(lit("{not json"), "pid", "default").as("b"))
    val r = df.collect()(0)
    assert(r.getString(0) === "default" && r.getString(1) === "default")
  }

  test("redactFields NULLs exactly the fields the auths cannot see, keeping rows") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, pid STRING, pop BIGINT, vis STRING")
    val rows = Seq(
      // pid needs TS, geometry-ish fields need S, rest default ("" = public)
      org.apache.spark.sql.Row(1L, "p-1", 100L, """{"pid":"TS", "geo.*":"S"}"""),
      org.apache.spark.sql.Row(2L, "p-2", 200L, null)).asJava
    val df = spark.createDataFrame(rows, schema)
    val redacted = Visibility.redactFields(df, "vis", Seq("S"), Seq("pid", "pop"), "")
    val got = redacted.orderBy("id").collect()
    // row 1: pid requires TS (not held) -> NULL; pop falls to "" -> visible
    assert(got(0).isNullAt(1) && got(0).getLong(2) === 100L)
    // row 2: no definition -> both fields on the default "" -> visible
    assert(got(1).getString(1) === "p-2" && got(1).getLong(2) === 200L)
  }
}

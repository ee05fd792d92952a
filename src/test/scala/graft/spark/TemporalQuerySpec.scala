package graft.spark

import org.apache.spark.sql.functions._
import graft.index.TemporalAlgebra.{TemporalRange, StartTime, EndTime}

/**
 * The Catalyst→constraint translation and the index-probed time query
 * (TemporalQuery): sound pruning on top of the faithful
 * ExtractTimeFilterVisitor port. Equivalence is checked against the plain
 * filtered scan on data with MICROSECOND-precision timestamps, so the
 * ±1 ms probe widening is load-bearing, not decorative.
 */
class TemporalQuerySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
  private def ms(s: String) = java.time.Instant.parse(s).toEpochMilli

  // 2000 rows at ~17-minute strides spanning ~24 days, each with a
  // MICROSECOND tail; plus exact boundary rows around a predicate instant
  private lazy val data = {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 2000).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        base.plusMillis(i * 1037123L).plusNanos(((i * 737) % 1000) * 1000L)))
    } ++ Seq(
      (9001L, ts("2024-01-05T00:00:00Z")),
      (9002L, ts("2024-01-05T00:00:00.000500Z")), // in (t, t+1ms): the widening case
      (9003L, ts("2024-01-05T00:00:00.001Z")))
    rows.toDF("id", "ts")
  }
  private lazy val index = SecondaryIndex.buildTemporal(data, "id", "ts")

  /** translate through the analyzer like timeIndexedQuery does (Spark 4's
    * Column API builds ColumnNode wrappers, not raw Catalyst nodes). */
  private def tr(c: org.apache.spark.sql.Column,
                 df: => org.apache.spark.sql.DataFrame = data) =
    TemporalQuery.translate(TemporalQuery.analyzedCondition(df, c), "ts")

  test("translate: conjunction of comparisons gives the ±1ms-adjusted window") {
    val t0 = ms("2024-01-05T00:00:00Z"); val t1 = ms("2024-01-09T12:00:00Z")
    val got = tr(col("ts") > lit(ts("2024-01-05T00:00:00Z")) &&
      col("ts") <= lit(ts("2024-01-09T12:00:00Z")))
    assert(got === Some(List(TemporalRange(t0 + 1, t1))))
  }

  test("translate soundness: OR with a non-temporal arm refuses; AND keeps; NOT over a dropped conjunct refuses") {
    val w = col("ts") > lit(ts("2024-01-05T00:00:00Z"))
    // OR with a non-ts arm would let rows escape the probe → None
    assert(tr(w || col("id") > 5L).isEmpty)
    // AND with a non-ts arm is a sound widening → Some
    assert(tr(w && col("id") > 5L).nonEmpty)
    // NOT over that widened AND would under-approximate → None
    assert(tr(!(w && col("id") > 5L)).isEmpty)
    // NOT over a purely temporal body is exact → Some (complement)
    assert(tr(!w) === Some(List(TemporalRange(StartTime, ms("2024-01-05T00:00:00Z")))))
    // comparisons on a different timestamp column do not constrain ts
    assert(tr(col("other_ts") > lit(ts("2024-01-05T00:00:00Z")),
      data.withColumn("other_ts", col("ts"))).isEmpty)
  }

  test("translate: contradictory AND is provably empty (Some(Nil))") {
    val got = tr(col("ts") < lit(ts("2024-01-02T00:00:00Z")) &&
      col("ts") > lit(ts("2024-01-09T00:00:00Z")))
    assert(got === Some(Nil))
  }

  test("timeIndexedQuery matches the plain filtered scan, including sub-ms boundary rows") {
    val preds = Seq(
      col("ts") > lit(ts("2024-01-05T00:00:00Z")) &&
        col("ts") <= lit(ts("2024-01-09T12:00:00Z")),
      // union of two windows via NOT(OR) — exercises complement + Or
      (col("ts") > lit(ts("2024-01-03T00:00:00Z")) &&
        col("ts") < lit(ts("2024-01-06T00:00:00Z"))) ||
        !(col("ts") >= lit(ts("2024-01-20T00:00:00Z")) ||
          col("ts") < lit(ts("2024-01-12T00:00:00Z"))),
      col("ts") === lit(ts("2024-01-05T00:00:00Z")),
      // unconstrainable shape falls back to the exact scan
      col("ts") > lit(ts("2024-01-05T00:00:00Z")) || col("id") === 9003L)
    for (p <- preds) {
      val expected = data.where(p).select("id").collect().map(_.getLong(0)).toSet
      val got = TemporalQuery.timeIndexedQuery(data, index, "id", "ts", p)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"predicate: $p")
    }
    // the 500µs row sits strictly inside (t, t+1ms): only the widened probe finds it
    val gtOnly = TemporalQuery.timeIndexedQuery(data, index, "id", "ts",
      col("ts") > lit(ts("2024-01-05T00:00:00Z"))).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(gtOnly.contains(9002L) && gtOnly.contains(9003L) && !gtOnly.contains(9001L))
  }

  test("provably-empty predicate returns the empty frame without probing") {
    val out = TemporalQuery.timeIndexedQuery(data, index, "id", "ts",
      col("ts") < lit(ts("2024-01-02T00:00:00Z")) &&
        col("ts") > lit(ts("2024-01-09T00:00:00Z")))
    assert(out.count() === 0L)
    assert(out.columns.toSeq === data.columns.toSeq)
    // plan contains no join: the empty case short-circuits
    assert(!out.queryExecution.sparkPlan.toString.toLowerCase.contains("join"))
  }

  test("probe ranges saturate at the algebra's domain ends") {
    val rs = TemporalQuery.probeRanges(List(TemporalRange(StartTime, EndTime),
      TemporalRange(Long.MinValue, 5L)))
    assert(rs === List(TemporalRange(StartTime - 1, EndTime),
      TemporalRange(Long.MinValue, 6L)))
  }
}

package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.PropertyFilterExtract.{KRange, NumericConstraint}

/**
 * The numeric secondary-index query route ([[PropertyQuery]]): extraction
 * soundness (incl. the negative-value divergence from the reference's
 * Double.MIN_VALUE sentinel), probe-equals-brute-force equivalence over
 * random predicates, contradiction and fallback paths, and the probe
 * actually pruning the index scan.
 */
class PropertyQuerySpec extends AnyFunSuite with SparkTestBase {

  private lazy val data = {
    import spark.implicits._
    // values straddle zero on purpose: the reference's faithful
    // MIN_VALUE open-low sentinel would prune ids with negative v
    (1 to 400).map(i => (i.toLong, (i - 200) * 0.5)).toDF("id", "v").cache()
  }
  private lazy val idx = SecondaryIndex.build(data, "id", "v")

  private def route(pred: org.apache.spark.sql.Column) =
    PropertyQuery.numericIndexedQuery(data, idx, "id", "v", pred)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("x < v keeps NEGATIVE values (sound ±inf sentinels, not Double.MIN_VALUE)") {
    val got = ids(route(col("v") < 9.0))
    val want = ids(data.where(col("v") < 9.0))
    assert(got === want)
    assert(want.exists(i => i < 200)) // negative-v rows really are in play
  }

  test("random AND/OR predicate equivalence vs brute force") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 30) {
      def leaf() = {
        val t = rnd.nextInt(5); val v = (rnd.nextInt(400) - 200) * 0.5
        t match {
          case 0 => col("v") > v
          case 1 => col("v") >= v
          case 2 => col("v") < v
          case 3 => col("v") <= v
          case 4 => col("v") === v
        }
      }
      val pred = rnd.nextInt(3) match {
        case 0 => leaf() && leaf()
        case 1 => leaf() || leaf()
        case 2 => (leaf() && leaf()) || leaf()
      }
      assert(ids(route(pred)) === ids(data.where(pred)))
    }
  }

  test("contradiction probes nothing but keeps the schema; flipped sides canonicalize") {
    val empty = route(col("v") > lit(5.0) && col("v") < lit(3.0))
    assert(empty.columns.toSeq === Seq("id", "v") && empty.count() === 0L)
    // 3.0 > v === v < 3.0
    assert(ids(route(lit(3.0) > col("v"))) === ids(data.where(col("v") < 3.0)))
  }

  test("NOT / foreign-column OR arms / NaN bounds fall back to the exact full scan") {
    val notPred = !(col("v") >= 3.0)
    assert(PropertyQuery.translate(
      TemporalQuery.analyzedCondition(data, notPred), "v").isEmpty)
    assert(ids(route(notPred)) === ids(data.where(notPred)))

    val mixedOr = (col("v") > 50.0) || (col("id") === 7L)
    assert(PropertyQuery.translate(
      TemporalQuery.analyzedCondition(data, mixedOr), "v").isEmpty)
    assert(ids(route(mixedOr)) === ids(data.where(mixedOr)))

    assert(PropertyQuery.translate(
      TemporalQuery.analyzedCondition(data, col("v") < lit(Double.NaN)), "v").isEmpty)
  }

  test("AND drops foreign conjuncts (widening) but still constrains the column") {
    val pred = col("v") >= 10.0 && col("id") % 2 === 0
    val c = PropertyQuery.translate(
      TemporalQuery.analyzedCondition(data, pred), "v").get
    assert(c.lower.v === 10.0 && c.inclusiveLow && c.upper.v.isPosInfinity)
    assert(ids(route(pred)) === ids(data.where(pred)))
  }

  test("union of disjoint OR arms spans; merge inclusivity survives the route") {
    val pred = (col("v") >= 1.0 && col("v") < 2.0) || (col("v") > 80.0)
    val c = PropertyQuery.translate(
      TemporalQuery.analyzedCondition(data, pred), "v").get
    assert(c === NumericConstraint("v",
      graft.index.PropertyFilterExtract.Num.dbl(1.0),
      graft.index.PropertyFilterExtract.Num.dbl(Double.PositiveInfinity),
      inclusiveLow = true, inclusiveHigh = true, KRange))
    assert(ids(route(pred)) === ids(data.where(pred)))
  }

  test("the probe prunes: index rows surviving the sec_key range < full index") {
    // mirror the route's internal probe on a narrow interval
    val lo = graft.index.Lexicoders.encodeDouble(10.0)
    val hi = graft.index.Lexicoders.encodeDouble(20.0)
    val probed = idx.where(col("sec_key") >= lit(lo) && col("sec_key") <= lit(hi)).count()
    assert(probed < idx.count() / 4) // 21 of 400 values in [10, 20]
    assert(probed === data.where(col("v").between(10.0, 20.0)).count())
  }
}

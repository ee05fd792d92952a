package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{
  And => CAnd, Attribute, Cast, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Not => CNot,
  Or => COr, RuntimeReplaceable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

import graft.index.TimeFilterExtract
import graft.index.TimeFilterExtract._
import graft.index.TemporalAlgebra.TemporalRange

/**
 * Temporal query planning over the secondary time index — the Spark-native
 * CQLQuery route for TIME: extract per-attribute temporal constraints from
 * an arbitrary boolean predicate ([[TimeFilterExtract]], the
 * ExtractTimeFilterVisitor port), turn them into lexicoded byte ranges on
 * the stored (sec_key → id) temporal index, and keep the original predicate
 * as the exact fine filter (reference: extensions/adapters/vector/.../
 * plugin/CQLQuery.java:63-240 composing ExtractTimeFilterVisitor with
 * TemporalIndexStrategy ranges).
 *
 * Soundness layer ON TOP of the faithful extractor: the reference visitor
 * silently DROPS non-temporal arms of an OR and complements approximated
 * NOT bodies — fine for its fine-filtered scans only when every OR arm
 * constrains the same attribute. [[translate]] therefore refuses
 * (→ full scan) any shape whose extracted ranges could be NARROWER than
 * the predicate: an OR with a non-temporal or different-attribute arm, and
 * a NOT over anything that is not exactly representable (an AND that
 * dropped a non-temporal conjunct is only an over-approximation, so a NOT
 * above it would under-approximate). Probe ranges are additionally widened
 * by ±1 ms: the algebra is millisecond-exact (GeoTools dates) while Spark
 * timestamps carry microseconds, and `ts > t` must not lose rows in
 * (t, t+1ms).
 */
object TemporalQuery {

  private def isTimestampType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** millis of a foldable timestamp/date expression, else None.
    * RuntimeReplaceable wrappers (to_timestamp → ParseToTimestamp) report
    * non-foldable and refuse eval — unwrap to their replacement. */
  private def literalMillis(e: Expression): Option[Long] = e match {
    case r: RuntimeReplaceable => literalMillis(r.replacement)
    case e if e.foldable && isTimestampType(e.dataType) =>
      Option(e.eval(null)).map(us => Math.floorDiv(us.asInstanceOf[Long], 1000L))
    case e if e.foldable && e.dataType == DateType =>
      Option(e.eval(null)).map(d => d.asInstanceOf[Int].toLong * 86400000L)
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name) // covers resolved and unresolved attributes
    case Cast(inner, dt, _, _) if isTimestampType(dt) => attrName(inner)
    case _ => None
  }

  /** (node, exact): exact means the extracted ranges are neither wider nor
    * narrower than the predicate at ms granularity — required under NOT. */
  private def trans(e: Expression, tsCol: String): Option[(Node, Boolean)] = {
    def sides(l: Expression, r: Expression): Option[(Expr, Expr)] =
      (attrName(l), literalMillis(r), literalMillis(l), attrName(r)) match {
        case (Some(n), Some(ms), _, _) if n == tsCol => Some((Prop(n), Lit(ms)))
        case (_, _, Some(ms), Some(n)) if n == tsCol => Some((Lit(ms), Prop(n)))
        case _ => None
      }
    e match {
      case CAnd(l, r) =>
        (trans(l, tsCol), trans(r, tsCol)) match {
          case (Some((ln, le)), Some((rn, re))) => Some((And(List(ln, rn)), le && re))
          // dropping a non-temporal conjunct widens the ranges: sound for
          // pruning, but no longer exact
          case (Some((ln, _)), None) => Some((ln, false))
          case (None, Some((rn, _))) => Some((rn, false))
          case _ => None
        }
      case COr(l, r) =>
        // every OR arm must constrain THIS column, else rows of the other
        // arm would escape the probe
        for ((ln, le) <- trans(l, tsCol); (rn, re) <- trans(r, tsCol))
          yield (Or(List(ln, rn)), le && re)
      case CNot(c) =>
        trans(c, tsCol).collect { case (n, true) => (Not(n), true) }
      case GreaterThan(l, r)        => sides(l, r).map { case (a, b) => (Gt(a, b), true) }
      case GreaterThanOrEqual(l, r) => sides(l, r).map { case (a, b) => (Ge(a, b), true) }
      case LessThan(l, r)           => sides(l, r).map { case (a, b) => (Lt(a, b), true) }
      case LessThanOrEqual(l, r)    => sides(l, r).map { case (a, b) => (Le(a, b), true) }
      case EqualTo(l, r)            => sides(l, r).map { case (a, b) => (Eq(a, b), true) }
      case _ => None
    }
  }

  /** extract the sound prunable range list for `tsCol` from a predicate.
    * None = not constrainable (full scan); Some(Nil) = provably empty. */
  def translate(pred: Expression, tsCol: String): Option[List[TemporalRange]] =
    trans(pred, tsCol).map { case (node, _) =>
      val cs = TimeFilterExtract.getConstraints(node)
      if (cs.hasConstraintsFor(tsCol)) cs.rangesFor(tsCol)
      else List(graft.index.TemporalAlgebra.FullRange)
    }

  private def satDec(v: Long): Long = if (v == Long.MinValue) v else v - 1
  private def satInc(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  /** the ±1 ms probe widening (µs data under a ms algebra). */
  def probeRanges(ranges: List[TemporalRange]): List[TemporalRange] =
    ranges.map(r => TemporalRange(satDec(r.start), satInc(r.end)))

  /** query THROUGH the temporal secondary index with an arbitrary
    * predicate: extracted ranges become one OR of sec_key byte-range
    * conditions on the index table (each pushable to the parquet scan),
    * matching ids join back to the primary, and the original predicate
    * runs as the exact fine filter. Falls back to a plain filtered scan
    * when the predicate is not soundly constrainable. */
  /** the ANALYZED Catalyst condition of `df.where(pred)` — Spark 4's
    * Column API builds ColumnNode wrappers (UnresolvedFunction(">", …)),
    * so translation must run on the analyzer's output, where comparisons
    * are real GreaterThan/LessThan/… nodes and literals carry their
    * micros. */
  def analyzedCondition(df: DataFrame, pred: Column): Expression =
    df.where(pred).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(Literal.TrueLiteral)

  def timeIndexedQuery(primary: DataFrame, index: DataFrame, idCol: String,
                       tsCol: String, pred: Column): DataFrame = {
    translate(analyzedCondition(primary, pred), tsCol) match {
      case None =>
        primary.where(pred) // not constrainable — exact full scan
      case Some(Nil) =>
        primary.where(pred).where(lit(false)) // provably empty, same schema
      case Some(ranges) =>
        val cond = probeRanges(ranges).map { r =>
          col("sec_key") >= lit(graft.index.Lexicoders.encodeLong(r.start)) &&
            col("sec_key") <= lit(graft.index.Lexicoders.encodeLong(r.end))
        }.reduce(_ || _)
        val hits = index.where(cond).select(col(idCol))
        primary.join(hits, idCol).where(pred)
    }
  }
}


package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{
  And => CAnd, Attribute, Cast, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Not => CNot, Or => COr,
  RuntimeReplaceable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, FloatType,
  IntegerType, LongType, ShortType}

import graft.index.PropertyFilterExtract
import graft.index.PropertyFilterExtract._

/**
 * Numeric attribute-query planning over the secondary numeric index — the
 * Spark-native route for the reference's CQLQuery-over-secondary-index path
 * (extensions/adapters/vector/.../plugin/CQLQuery.java composing
 * PropertyFilterVisitor constraints with NumericIndexStrategy ranges; the
 * numeric sibling of [[TemporalQuery]]): extract a per-attribute
 * [[PropertyFilterExtract.NumericConstraint]] from an arbitrary boolean
 * predicate, turn it into ONE lexicoded byte range on the stored
 * (sec_key → id) numeric index, and keep the original predicate as the
 * exact fine filter.
 *
 * Soundness layer ON TOP of the faithful extractor:
 *  - open ends use [[Sentinels.sound]] (±∞), NOT the reference's
 *    Double.MIN_VALUE/MAX_VALUE — lexicode(Double.MIN_VALUE) sorts ABOVE
 *    every negative key, so the faithful sentinel would silently prune
 *    negative values from a `x < v` scan (a reference quirk its tests pin
 *    but a pruning route must not inherit; PropertyQuerySpec pins negative
 *    rows surviving).
 *  - an OR arm that does not itself constrain the indexed column (or a NOT
 *    anywhere) makes the predicate non-constrainable → exact full scan;
 *    AND may drop non-translatable arms (widening only).
 *  - probe bounds are used INCLUSIVELY whatever the constraint's
 *    inclusivity — wider is sound; the fine filter is exact. An
 *    equals/range at ±0.0 spans both signed zeros (they lexicode apart
 *    but compare SQL-equal).
 */
object PropertyQuery {

  private def isNumericType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  /** double value of a foldable numeric expression, tagged Long-kind for
    * integral literals (the Java `Number.equals` fidelity bit — inert
    * under the sound sentinels but kept for the shared merge code). */
  private def literalNum(e: Expression): Option[Num] = e match {
    case r: RuntimeReplaceable => literalNum(r.replacement)
    case e if e.foldable && isNumericType(e.dataType) =>
      Option(e.eval(null)).map { v =>
        e.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            Num.long(v.asInstanceOf[Number].longValue())
          case _: DecimalType =>
            Num.dbl(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
          case _ => Num.dbl(v.asInstanceOf[Number].doubleValue())
        }
      // Spark's SQL order puts NaN ABOVE +∞ while NaN is outside the
      // lexicoder contract — a NaN bound must fall back to the full scan
      }.filterNot(n => n.v.isNaN)
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case Cast(inner, dt, _, _) if isNumericType(dt) => attrName(inner)
    case _ => None
  }

  /** Catalyst predicate → extractor AST over `valCol`. None = this subtree
    * cannot soundly constrain the column. BETWEEN arrives pre-desugared
    * as >= AND <=. */
  private def trans(e: Expression, valCol: String): Option[Node] = {
    def sides(l: Expression, r: Expression): Option[(Expr, Expr, Boolean)] =
      (attrName(l), literalNum(r), literalNum(l), attrName(r)) match {
        case (Some(n), Some(v), _, _) if n == valCol => Some((Prop(n), NumLit(v), false))
        case (_, _, Some(v), Some(n)) if n == valCol => Some((Prop(n), NumLit(v), true))
        case _ => None
      }
    e match {
      case CAnd(l, r) =>
        (trans(l, valCol), trans(r, valCol)) match {
          case (Some(ln), Some(rn)) => Some(And(List(ln, rn)))
          // dropping a conjunct only widens the extracted interval
          case (Some(ln), None) => Some(ln)
          case (None, Some(rn)) => Some(rn)
          case _ => None
        }
      case COr(l, r) =>
        // every OR arm must constrain THIS column, else rows of the other
        // arm would escape the probe
        for (ln <- trans(l, valCol); rn <- trans(r, valCol)) yield Or(List(ln, rn))
      case CNot(_) => None // the visitor maps NOT to "no constraint"
      // flipped literal-vs-attribute shapes mirror to the canonical arm
      case GreaterThan(l, r)        => sides(l, r).map { case (p, v, flip) => if (flip) Lt(p, v) else Gt(p, v) }
      case GreaterThanOrEqual(l, r) => sides(l, r).map { case (p, v, flip) => if (flip) Le(p, v) else Ge(p, v) }
      case LessThan(l, r)           => sides(l, r).map { case (p, v, flip) => if (flip) Gt(p, v) else Lt(p, v) }
      case LessThanOrEqual(l, r)    => sides(l, r).map { case (p, v, flip) => if (flip) Ge(p, v) else Le(p, v) }
      case EqualTo(l, r)            => sides(l, r).map { case (p, v, _) => Eq(p, v) }
      case _ => None
    }
  }

  /** extract the sound prunable interval for `valCol` from a predicate.
    * None = not constrainable (full scan); Some(c) may be a contradiction
    * (lower > upper, or equal bounds with an exclusive end) → empty. */
  def translate(pred: Expression, valCol: String): Option[NumericConstraint] =
    trans(pred, valCol).flatMap { node =>
      PropertyFilterExtract.getConstraints(node, Sentinels.sound).byId(valCol)
    }.collect { case n: NumericConstraint => n }

  private def isContradiction(c: NumericConstraint): Boolean =
    c.lower.v > c.upper.v ||
      (c.lower.v == c.upper.v && !(c.inclusiveLow && c.inclusiveHigh))

  /** query THROUGH the numeric secondary index with an arbitrary numeric
    * predicate over `valCol`: the extracted interval becomes one sec_key
    * byte-range condition on the index table (pushed to the parquet scan),
    * matching ids join back to the primary, and the original predicate
    * runs as the exact fine filter. Falls back to a plain filtered scan
    * when the predicate is not soundly constrainable. */
  def numericIndexedQuery(primary: DataFrame, index: DataFrame, idCol: String,
                          valCol: String, pred: Column): DataFrame = {
    translate(TemporalQuery.analyzedCondition(primary, pred), valCol) match {
      case None =>
        primary.where(pred) // not constrainable — exact full scan
      case Some(c) if isContradiction(c) =>
        primary.where(pred).where(lit(false)) // provably empty, same schema
      case Some(c) =>
        // widen to both signed zeros when a bound lands on 0.0
        val lo = if (c.lower.v == 0.0) -0.0 else c.lower.v
        val hi = if (c.upper.v == 0.0) 0.0 else c.upper.v
        val hits = index
          .where(col("sec_key") >= lit(graft.index.Lexicoders.encodeDouble(lo)) &&
            col("sec_key") <= lit(graft.index.Lexicoders.encodeDouble(hi)))
          .select(col(idCol))
        primary.join(hits, idCol).where(pred)
    }
  }
}

package graft.index

import scala.collection.immutable.ListMap

/**
 * Per-attribute property-constraint extraction from a boolean filter tree —
 * the port of the reference's PropertyFilterVisitor + PropertyConstraintSet
 * (extensions/adapters/vector/.../query/cql/PropertyFilterVisitor.java:1-560,
 * PropertyConstraintSet.java:1-120), the piece that turns an arbitrary
 * attribute predicate into the numeric / text constraints the SECONDARY
 * indexes can scan (the numeric sibling of [[TimeFilterExtract]]).
 *
 * Faithful-port notes (each pinned by PropertyFilterExtractSpec's port of
 * PropertyFilterVisitorTest):
 *  - Open comparison ends use the JAVA sentinels: `prop < v` →
 *    [Double.MIN_VALUE, v) and `prop > v` → (v, Double.MAX_VALUE]
 *    (NumericLessThanConstraint.java / NumericGreaterThanConstraint.java).
 *    Java's `Double.MIN_VALUE` is the smallest POSITIVE subnormal
 *    (4.9e-324), NOT negative infinity — preserved verbatim, including the
 *    consequence that a reference-faithful lower sentinel sits ABOVE every
 *    negative value. Callers that need a sound open end (the Spark query
 *    route) pass their own sentinels via [[Sentinels]].
 *  - Constraint merge inclusivity follows NumericQueryConstraint.intersect/
 *    union exactly: when a bound VALUE-equals the other side's (Java
 *    `Number.equals` — same runtime class AND value, so a Long 4 never
 *    equals a Double 4.0), inclusivities AND under intersect / OR under
 *    union; otherwise the surviving bound keeps its own inclusivity
 *    (NumericQueryConstraint.java:66-118). Merged bounds are Doubles
 *    (`Math.max(double,double)`), whatever the inputs were.
 *  - AND intersects per attribute, OR unions per attribute
 *    (PropertyConstraintSet.add routed by visit(And)/visit(Or)); NOT,
 *    spatial, temporal, Id, INCLUDE/EXCLUDE, IS NULL/NIL and arithmetic
 *    expressions all contribute an EMPTY set (every such visit arm returns
 *    `new PropertyConstraintSet()`).
 *  - `prop != v` contributes NOTHING — the reference arm returns the raw
 *    field id (not a constraint set), which And/Or skip.
 *  - Text: equality and BETWEEN over strings build a
 *    FilterableTextRangeConstraint (equality ctor: start = end = value,
 *    folded to lowercase when case-insensitive); LIKE builds a
 *    FilterableLikeConstraint (`%` → `.*`, matching-case flag); ordered
 *    comparisons over text are the reference's open TODO and extract
 *    nothing. Text-range merges take max/min of the endpoints and AND/OR
 *    the case-sensitivity flags (FilterableTextRangeConstraint.java:118-150).
 *  - Mixed-type merges on one attribute return `this` unchanged (every
 *    reference intersect/union falls through on a class mismatch; the LIKE
 *    arm class-casts — composite semantics — so a LIKE∧LIKE pair keeps
 *    both sides here as [[CompositeConstraint]], matching
 *    CompositeConstraints' accept-all/accept-any reading).
 */
object PropertyFilterExtract {

  // ---------- Java Number stand-in ----------

  /** A Java `Number` bound: value + runtime-type tag, so `Number.equals`
    * ports exactly (Long 4 != Double 4.0; Doubles compare by bits, so
    * -0.0 != 0.0 and NaN == NaN, as Double.equals defines). */
  final case class Num(v: Double, isLong: Boolean) {
    def javaEquals(o: Num): Boolean =
      isLong == o.isLong &&
        (if (isLong) v == o.v
         else java.lang.Double.doubleToLongBits(v) == java.lang.Double.doubleToLongBits(o.v))
  }
  object Num {
    def long(v: Long): Num = Num(v.toDouble, isLong = true)
    def dbl(v: Double): Num = Num(v, isLong = false)
  }

  /** Open-end sentinels. [[Sentinels.reference]] is the faithful pair
    * (Double.MIN_VALUE / Double.MAX_VALUE); [[Sentinels.sound]] is the
    * ±∞ pair a pruning query route must use so `x < v` keeps negative x. */
  final case class Sentinels(openLow: Num, openHigh: Num)
  object Sentinels {
    val reference: Sentinels =
      Sentinels(Num.dbl(java.lang.Double.MIN_VALUE), Num.dbl(java.lang.Double.MAX_VALUE))
    val sound: Sentinels =
      Sentinels(Num.dbl(Double.NegativeInfinity), Num.dbl(Double.PositiveInfinity))
  }

  // ---------- constraints (FilterableConstraints family) ----------

  sealed trait Constraint {
    def fieldId: String
    def intersectC(other: Constraint): Constraint
    def unionC(other: Constraint): Constraint
  }

  /** Which reference class produced a numeric constraint — the test suite
    * downcasts (NumericLessThanConstraint etc.), so the tag is observable. */
  sealed trait NumKind
  case object KLt extends NumKind
  case object KLe extends NumKind
  case object KGt extends NumKind
  case object KGe extends NumKind
  case object KEq extends NumKind
  /** base NumericQueryConstraint: BETWEEN and every merge result. */
  case object KRange extends NumKind

  /** NumericQueryConstraint + subclasses (one interval with per-end
    * inclusivity; merges per the reference's replace/equals rules). */
  final case class NumericConstraint(fieldId: String, lower: Num, upper: Num,
                                     inclusiveLow: Boolean, inclusiveHigh: Boolean,
                                     kind: NumKind) extends Constraint {
    def intersectC(other: Constraint): Constraint = other match {
      case o: NumericConstraint if o.fieldId == fieldId =>
        val lowEquals = lower.javaEquals(o.lower)
        val upperEquals = upper.javaEquals(o.upper)
        val replaceMin = lower.v < o.lower.v
        val replaceMax = upper.v > o.upper.v
        NumericConstraint(fieldId,
          Num.dbl(math.max(lower.v, o.lower.v)), Num.dbl(math.min(upper.v, o.upper.v)),
          if (lowEquals) o.inclusiveLow & inclusiveLow
          else if (replaceMin) o.inclusiveLow else inclusiveLow,
          if (upperEquals) o.inclusiveHigh & inclusiveHigh
          else if (replaceMax) o.inclusiveHigh else inclusiveHigh,
          KRange)
      case _ => this
    }
    def unionC(other: Constraint): Constraint = other match {
      case o: NumericConstraint if o.fieldId == fieldId =>
        val lowEquals = lower.javaEquals(o.lower)
        val upperEquals = upper.javaEquals(o.upper)
        val replaceMin = lower.v > o.lower.v
        val replaceMax = upper.v < o.upper.v
        NumericConstraint(fieldId,
          Num.dbl(math.min(lower.v, o.lower.v)), Num.dbl(math.max(upper.v, o.upper.v)),
          if (lowEquals) o.inclusiveLow | inclusiveLow
          else if (replaceMin) o.inclusiveLow else inclusiveLow,
          if (upperEquals) o.inclusiveHigh | inclusiveHigh
          else if (replaceMax) o.inclusiveHigh else inclusiveHigh,
          KRange)
      case _ => this
    }
  }

  /** FilterableTextRangeConstraint: [start, end] closed string interval;
    * the equality ctor sets start = end = value; case-insensitive folds
    * the endpoints at construction. */
  final case class TextRangeConstraint(fieldId: String, start: String, end: String,
                                       caseSensitive: Boolean) extends Constraint {
    def intersectC(other: Constraint): Constraint = other match {
      case o: TextRangeConstraint if o.fieldId == fieldId =>
        TextRangeConstraint(fieldId,
          if (start.compareTo(o.start) < 0) o.start else start,
          if (end.compareTo(o.end) > 0) o.end else end,
          o.caseSensitive & caseSensitive)
      case _ => this
    }
    def unionC(other: Constraint): Constraint = other match {
      case o: TextRangeConstraint if o.fieldId == fieldId =>
        TextRangeConstraint(fieldId,
          if (start.compareTo(o.start) > 0) o.start else start,
          if (end.compareTo(o.end) < 0) o.end else end,
          o.caseSensitive | caseSensitive)
      case _ => this
    }
  }
  object TextRangeConstraint {
    /** the equality constructor (value folded when insensitive). */
    def equalsTo(fieldId: String, value: String, caseSensitive: Boolean): TextRangeConstraint = {
      val v = if (caseSensitive) value else value.toLowerCase
      TextRangeConstraint(fieldId, v, v, caseSensitive)
    }
  }

  /** FilterableLikeConstraint: `%` → `.*` regex with the matching-case
    * flag; pairs of LIKEs compose (CompositeConstraints). */
  final case class LikeConstraint(fieldId: String, expression: String,
                                  caseSensitive: Boolean) extends Constraint {
    def regex: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(expression.replaceAll("%", ".*"),
        if (caseSensitive) 0 else java.util.regex.Pattern.CASE_INSENSITIVE)
    /** LikeFilter.accept: full-match against the translated regex. */
    def accept(value: String): Boolean = regex.matcher(value).matches()
    def intersectC(other: Constraint): Constraint = other match {
      case o: LikeConstraint => CompositeConstraint(fieldId, List(this, o), intersect = true)
      case _ => this
    }
    def unionC(other: Constraint): Constraint = other match {
      case o: LikeConstraint => CompositeConstraint(fieldId, List(this, o), intersect = false)
      case _ => this
    }
  }

  /** CompositeConstraints: an AND/OR bag of same-field constraints. */
  final case class CompositeConstraint(fieldId: String, parts: List[Constraint],
                                       intersect: Boolean) extends Constraint {
    def intersectC(other: Constraint): Constraint =
      if (intersect) CompositeConstraint(fieldId, parts :+ other, intersect = true) else this
    def unionC(other: Constraint): Constraint =
      if (!intersect) CompositeConstraint(fieldId, parts :+ other, intersect = false) else this
  }

  // ---------- PropertyConstraintSet ----------

  /** per-attribute constraint map; add() routes through the constraint's
    * own intersect/union exactly like the reference set. */
  final case class ConstraintSet(entries: ListMap[String, Constraint]) {
    def add(c: Constraint, intersect: Boolean): ConstraintSet =
      entries.get(c.fieldId) match {
        case None => ConstraintSet(entries.updated(c.fieldId, c))
        case Some(existing) =>
          ConstraintSet(entries.updated(c.fieldId,
            if (intersect) existing.intersectC(c) else existing.unionC(c)))
      }
    def intersect(o: ConstraintSet): ConstraintSet =
      o.entries.values.foldLeft(this)((s, c) => s.add(c, intersect = true))
    def union(o: ConstraintSet): ConstraintSet =
      o.entries.values.foldLeft(this)((s, c) => s.add(c, intersect = false))
    def byId(fieldId: String): Option[Constraint] = entries.get(fieldId)
  }
  object ConstraintSet {
    val empty: ConstraintSet = ConstraintSet(ListMap.empty)
    def of(c: Constraint): ConstraintSet = ConstraintSet(ListMap(c.fieldId -> c))
  }

  // ---------- the visitable AST ----------

  sealed trait Expr
  final case class Prop(name: String) extends Expr
  final case class NumLit(n: Num) extends Expr
  final case class StrLit(s: String) extends Expr
  /** geometry / date / anything else — extracts nothing. */
  case object OtherExpr extends Expr
  object NumLit {
    def long(v: Long): NumLit = NumLit(Num.long(v))
    def dbl(v: Double): NumLit = NumLit(Num.dbl(v))
  }

  sealed trait Node
  final case class Eq(p: Expr, v: Expr) extends Node
  final case class Ne(p: Expr, v: Expr) extends Node
  final case class Gt(p: Expr, v: Expr) extends Node
  final case class Ge(p: Expr, v: Expr) extends Node
  final case class Lt(p: Expr, v: Expr) extends Node
  final case class Le(p: Expr, v: Expr) extends Node
  final case class Between(p: Expr, lo: Expr, hi: Expr) extends Node
  final case class Like(p: Expr, pattern: String, matchCase: Boolean) extends Node
  final case class And(children: List[Node]) extends Node
  final case class Or(children: List[Node]) extends Node
  final case class Not(child: Node) extends Node
  /** BBOX / temporal / Id / INCLUDE / EXCLUDE / IS NULL / … */
  case object NonProperty extends Node

  // ---------- the visitor ----------

  /** filter.accept(new PropertyFilterVisitor(), null). Arms that return a
    * non-set in the reference (Ne → the raw field id) return None and are
    * skipped by And/Or, exactly as `instanceof PropertyConstraintSet`
    * does. */
  def visit(n: Node, s: Sentinels = Sentinels.reference): Option[ConstraintSet] = n match {
    case And(children) =>
      Some(children.flatMap(visit(_, s))
        .foldLeft(ConstraintSet.empty)(_ intersect _))
    case Or(children) =>
      Some(children.flatMap(visit(_, s))
        .foldLeft(ConstraintSet.empty)(_ union _))
    case Not(_) => Some(ConstraintSet.empty)
    case NonProperty => Some(ConstraintSet.empty)
    case Ne(_, _) => None // returns the bare field id upstream — skipped
    case Eq(Prop(f), NumLit(v)) =>
      Some(ConstraintSet.of(NumericConstraint(f, v, v, inclusiveLow = true, inclusiveHigh = true, KEq)))
    case Eq(Prop(f), StrLit(v)) =>
      Some(ConstraintSet.of(TextRangeConstraint.equalsTo(f, v, caseSensitive = true)))
    case Gt(Prop(f), NumLit(v)) =>
      Some(ConstraintSet.of(NumericConstraint(f, v, s.openHigh, inclusiveLow = false, inclusiveHigh = true, KGt)))
    case Ge(Prop(f), NumLit(v)) =>
      Some(ConstraintSet.of(NumericConstraint(f, v, s.openHigh, inclusiveLow = true, inclusiveHigh = true, KGe)))
    case Lt(Prop(f), NumLit(v)) =>
      Some(ConstraintSet.of(NumericConstraint(f, s.openLow, v, inclusiveLow = true, inclusiveHigh = false, KLt)))
    case Le(Prop(f), NumLit(v)) =>
      Some(ConstraintSet.of(NumericConstraint(f, s.openLow, v, inclusiveLow = true, inclusiveHigh = true, KLe)))
    case Between(Prop(f), NumLit(lo), NumLit(hi)) =>
      Some(ConstraintSet.of(NumericConstraint(f, lo, hi, inclusiveLow = true, inclusiveHigh = true, KRange)))
    case Between(Prop(f), StrLit(lo), StrLit(hi)) =>
      Some(ConstraintSet.of(TextRangeConstraint(f, lo, hi, caseSensitive = true)))
    case Like(Prop(f), pattern, matchCase) =>
      Some(ConstraintSet.of(LikeConstraint(f, pattern, matchCase)))
    // comparisons over text / non-literal shapes: the reference's open
    // TODO — an empty set
    case _: Eq | _: Gt | _: Ge | _: Lt | _: Le | _: Between | _: Like =>
      Some(ConstraintSet.empty)
  }

  /** top-level extraction (the tests' direct accept call). */
  def getConstraints(n: Node, s: Sentinels = Sentinels.reference): ConstraintSet =
    visit(n, s).getOrElse(ConstraintSet.empty)
}

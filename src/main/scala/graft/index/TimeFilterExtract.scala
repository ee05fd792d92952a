package graft.index

import graft.index.TemporalAlgebra.{TemporalRange, StartTime, EndTime, FullRange}
import scala.collection.immutable.ListMap

/**
 * Temporal-constraint extraction from a boolean filter tree — the port of
 * the reference's ExtractTimeFilterVisitor (extensions/adapters/vector/
 * .../plugin/ExtractTimeFilterVisitor.java:1-1370), the piece that turns an
 * arbitrary query predicate into per-attribute [[TemporalAlgebra]] range
 * lists the temporal index can scan.
 *
 * Faithful-port notes (each pinned by TimeFilterExtractSpec's ports of
 * ExtractTimeFilterVisitorTest):
 *  - Times are epoch MILLIS (GeoTools dates). Exclusive comparisons adjust
 *    by ±1 ms: `prop > t` → [t+1, END]; `prop < t` → [START, t-1]
 *    (visit(PropertyIsGreaterThan/LessThan), lines 1030-1123).
 *  - CQL periods are exclusive on BOTH ends: `during s/e` → [s+1, e-1]
 *    (btime(Period), lines 203-236); an inverted period is the empty set.
 *  - AND intersects per attribute, OR unions per attribute
 *    (visit(And/Or) via replaceWithIntersections/replaceWithMerged);
 *    a contradictory AND leaves an attribute entry with an EMPTY range
 *    list, which READS as the full range (TemporalConstraints.getStartRange/
 *    getEndRange return FULL_RANGE when empty) but makes the set isEmpty.
 *  - NOT complements each attribute's range list against [START, END]
 *    with the reference's closed-interval approximation: boundary points
 *    shared with the original set remain included (not(), lines 385-407) —
 *    sound for pruning, never for exactness.
 *  - NOT of a non-temporal/plain result passes it through verbatim; NOT of
 *    an EMPTY constraint list is EMPTY (notRanges.empty()), not full.
 *  - TEquals returns the literal's plain constraints UNNAMED (lines
 *    863-889) — so alone it extracts nothing at set level; a quirk
 *    preserved as-is.
 *  - Attribute pairs declared via `rangePairs` (addRangeVariables) collapse
 *    `start`/`end` entries into a `start_end` whole-row range: inside AND,
 *    an overlapping pair becomes [end.start, start.end]; a disjoint pair
 *    approximates to [start.start, end.end] and marks the result inexact
 *    (visit(And) post-pass, lines 322-353); at top level a single-sided
 *    pair completes with the other side (getConstraints, lines 108-138).
 */
object TimeFilterExtract {

  // ---------- the visitable AST (property-vs-literal temporal subset) ----------

  sealed trait Expr
  /** PropertyName — a (possibly range-paired) temporal attribute. */
  final case class Prop(name: String) extends Expr
  /** Date/Timestamp/Number literal in epoch millis (btime Date/Number arm). */
  final case class Lit(ms: Long) extends Expr
  /** CQL period literal (btime Period arm — exclusive both ends). */
  final case class PeriodLit(startMs: Long, endMs: Long) extends Expr
  /** geometry / string / anything non-temporal. */
  case object OtherExpr extends Expr

  sealed trait Node
  final case class After(e1: Expr, e2: Expr) extends Node
  final case class Before(e1: Expr, e2: Expr) extends Node
  final case class During(e1: Expr, e2: Expr) extends Node
  final case class TEquals(e1: Expr, e2: Expr) extends Node
  final case class Gt(e1: Expr, e2: Expr) extends Node
  final case class Ge(e1: Expr, e2: Expr) extends Node
  final case class Lt(e1: Expr, e2: Expr) extends Node
  final case class Le(e1: Expr, e2: Expr) extends Node
  final case class Eq(e1: Expr, e2: Expr) extends Node
  final case class Ne(e1: Expr, e2: Expr) extends Node
  final case class Between(e: Expr, lo: Expr, hi: Expr) extends Node
  final case class And(children: List[Node]) extends Node
  final case class Or(children: List[Node]) extends Node
  final case class Not(child: Node) extends Node
  /** INCLUDE/EXCLUDE, BBOX, LIKE, IS NULL, … — contributes nothing. */
  case object NonTemporal extends Node

  // ---------- results (TemporalConstraints / ParameterTimeConstraint / Set) ----------

  /** TemporalConstraints: ordered closed ranges + name; `param` marks the
    * ParameterTimeConstraint subclass (a constraint BOUND to an attribute).
    * Empty ranges READ as the full range but test as empty. */
  final case class Cons(ranges: List[TemporalRange], name: String, param: Boolean) {
    def isEmptyC: Boolean = ranges.isEmpty
    def startRange: TemporalRange = ranges.headOption.getOrElse(FullRange)
    def endRange: TemporalRange = ranges.lastOption.getOrElse(FullRange)
    /** TemporalConstraints.getMinOr: first start (+increment when nonzero). */
    def minOr(min: Long, inc: Int): Long =
      if (ranges.isEmpty) min else if (inc == 0) ranges.head.start else ranges.head.start + inc
    /** TemporalConstraints.getMaxOr: last end (+increment when nonzero). */
    def maxOr(max: Long, inc: Int): Long =
      if (ranges.isEmpty) max else if (inc == 0) ranges.last.end else ranges.last.end + inc
  }
  private def plain(rs: List[TemporalRange]): Cons = Cons(rs, "", param = false)
  private val emptyPlain = plain(Nil)

  /** TemporalConstraintsSet: per-attribute range lists. An entry PRESENT
    * with an empty list is a proven contradiction for that attribute; an
    * ABSENT entry is unconstrained. `exact` = !approximation. */
  final case class ConsSet(entries: ListMap[String, List[TemporalRange]], exact: Boolean) {
    def rangesFor(name: String): List[TemporalRange] = entries.getOrElse(name, Nil)
    /** getConstraintsFor(...).getStartRange() — absent/empty reads full. */
    def startRangeFor(name: String): TemporalRange = rangesFor(name).headOption.getOrElse(FullRange)
    def endRangeFor(name: String): TemporalRange = rangesFor(name).lastOption.getOrElse(FullRange)
    def hasConstraintsFor(name: String): Boolean = entries.contains(name)
    /** set-level isEmpty: no entries, or every entry empty. */
    def isEmptySet: Boolean = entries.isEmpty || entries.values.forall(_.isEmpty)
  }

  sealed trait Out
  final case class COut(c: Cons) extends Out
  final case class SOut(entries: ListMap[String, List[TemporalRange]], approx: Boolean) extends Out

  // ---------- the visitor ----------

  /** btime over an expression (literal arms of ExtractTimeFilterVisitor.btime
    * + visit(PropertyName) → full-range ParameterTimeConstraint). */
  private def evalExpr(e: Expr): Cons = e match {
    case Prop(name)   => Cons(List(FullRange), name, param = true)
    case Lit(ms)      => plain(List(TemporalRange(ms, ms)))
    case PeriodLit(s0, e0) =>
      // "all periods are exclusive": [s+1, e-1], empty when inverted
      val s = s0 + 1; val e = e0 - 1
      if (s > e) emptyPlain else plain(List(TemporalRange(s, e)))
    case OtherExpr    => emptyPlain
  }

  /** the reference's private not() — closed-interval complement with
    * boundary points retained. Empty in → empty out. */
  private[index] def complement(rs: List[TemporalRange]): List[TemporalRange] = {
    var out = List.empty[TemporalRange]
    var lastMax = StartTime
    for (r <- rs) {
      if (r.start > StartTime) out = TemporalAlgebra.add(out, TemporalRange(lastMax, r.start - 1))
      lastMax = r.end
    }
    if (rs.nonEmpty && EndTime > rs.last.end)
      out = TemporalAlgebra.add(out, TemporalRange(lastMax, EndTime))
    out
  }

  /** one comparison family step: pick the property side like the reference's
    * if/else (left param wins; otherwise the right side names the result). */
  private def cmp(e1: Expr, e2: Expr)(
      propLeft: Cons => List[TemporalRange],
      propRight: Cons => List[TemporalRange]): Out = {
    val l = evalExpr(e1); val r = evalExpr(e2)
    if (l.isEmptyC || r.isEmptyC) COut(emptyPlain)
    else if (l.param) COut(Cons(propLeft(r), l.name, param = true))
    else COut(Cons(propRight(l), r.name, param = true))
  }

  def visit(n: Node): Out = n match {
    case After(e1, e2) =>
      val l = evalExpr(e1); val r = evalExpr(e2)
      if (l.isEmptyC || r.isEmptyC) COut(emptyPlain)
      else if (l.param) COut(Cons(List(TemporalRange(r.maxOr(StartTime, 1), EndTime)), l.name, param = true))
      else if (r.param) COut(Cons(List(TemporalRange(StartTime, l.minOr(EndTime, -1))), r.name, param = true))
      else COut(emptyPlain) // property after property
    case Before(e1, e2) =>
      val l = evalExpr(e1); val r = evalExpr(e2)
      if (l.isEmptyC || r.isEmptyC) COut(emptyPlain)
      else if (l.param) COut(Cons(List(TemporalRange(StartTime, r.minOr(EndTime, -1))), l.name, param = true))
      else if (r.param) COut(Cons(List(TemporalRange(l.maxOr(StartTime, 1), EndTime)), r.name, param = true))
      else COut(emptyPlain)
    case During(e1, e2) =>
      val l = evalExpr(e1); val r = evalExpr(e2)
      if (l.isEmptyC || r.isEmptyC) COut(emptyPlain)
      else if (l.param) COut(Cons(r.ranges, l.name, param = true))
      else if (r.param) COut(r) // value during property: the full-range param
      else COut(emptyPlain)
    case TEquals(e1, e2) =>
      val l = evalExpr(e1); val r = evalExpr(e2)
      if (l.isEmptyC || r.isEmptyC) COut(emptyPlain)
      else if (l.param) COut(r) // plain, UNNAMED — the reference's quirk
      else if (r.param) COut(l)
      else COut(emptyPlain)
    case Gt(e1, e2) => cmp(e1, e2)(
      r => List(TemporalRange(r.startRange.start + 1, EndTime)),
      l => List(TemporalRange(StartTime, l.startRange.start - 1)))
    case Ge(e1, e2) => cmp(e1, e2)(
      r => List(TemporalRange(r.startRange.start, EndTime)),
      l => List(TemporalRange(StartTime, l.startRange.start)))
    case Lt(e1, e2) => cmp(e1, e2)(
      r => List(TemporalRange(StartTime, r.startRange.start - 1)),
      l => List(TemporalRange(l.startRange.start + 1, EndTime)))
    case Le(e1, e2) => cmp(e1, e2)(
      r => List(TemporalRange(StartTime, r.startRange.start)),
      l => List(TemporalRange(l.startRange.start, EndTime)))
    case Eq(e1, e2) => cmp(e1, e2)(
      r => List(TemporalRange(r.startRange.start, r.endRange.end)),
      l => List(TemporalRange(l.startRange.start, l.endRange.end)))
    case Ne(e1, e2) => cmp(e1, e2)(
      r => TemporalAlgebra.add(List(TemporalRange(StartTime, r.startRange.start)),
        TemporalRange(r.endRange.end, EndTime)),
      l => TemporalAlgebra.add(List(TemporalRange(StartTime, l.startRange.start)),
        TemporalRange(l.endRange.end, EndTime)))
    case Between(e, lo, hi) =>
      val p = evalExpr(e); val l = evalExpr(lo); val h = evalExpr(hi)
      if (p.isEmptyC) COut(emptyPlain)
      else COut(Cons(List(TemporalRange(l.startRange.start, h.endRange.end)), p.name, param = true))
    case And(children) => visitAnd(children, Nil)
    case Or(children)  =>
      var m = ListMap.empty[String, List[TemporalRange]]
      var approx = false
      for (c <- children) visit(c) match {
        case COut(Cons(rs, name, true)) =>
          m = m.updated(name, TemporalAlgebra.merge(m.getOrElse(name, Nil), rs))
        case SOut(es, a) =>
          approx |= a
          for ((k, v) <- es) m = m.updated(k, TemporalAlgebra.merge(m.getOrElse(k, Nil), v))
        case _ => // plain constraints contribute nothing
      }
      SOut(m, approx)
    case Not(child) => visit(child) match {
      case COut(Cons(rs, name, true)) => COut(Cons(complement(rs), name, param = true))
      case SOut(es, a) => SOut(es.map { case (k, v) => k -> complement(v) }, a)
      case other => other // plain/empty passes through verbatim
    }
    case NonTemporal => COut(emptyPlain)
    case Rewritten(out) => out
  }

  /** visit(And) including its validParamRanges post-pass. */
  private def visitAnd(children: List[Node], rangePairs: List[(String, String)]): SOut = {
    var m = ListMap.empty[String, List[TemporalRange]]
    var approx = false
    for (c <- children) visit(c) match {
      case COut(Cons(rs, name, true)) =>
        m = m.updated(name, TemporalAlgebra.findIntersections(m.getOrElse(name, Nil), rs))
      case SOut(es, a) =>
        approx |= a
        for ((k, v) <- es)
          m = m.updated(k, TemporalAlgebra.findIntersections(m.getOrElse(k, Nil), v))
      case _ => // plain constraints (INCLUDE, tequals, non-temporal) ignored
    }
    for ((sName, eName) <- rangePairs) {
      if (m.contains(sName) && m.contains(eName)) {
        val start = plain(m(sName)); val end = plain(m(eName))
        m = m - sName - eName
        val pairName = s"${sName}_$eName"
        val combined =
          if (start.endRange.end > end.startRange.start)
            TemporalRange(end.startRange.start, start.endRange.end)
          else {
            // multiple non-intersecting ranges make this an approximation
            approx |= start.ranges.size > 1 || end.ranges.size > 1
            TemporalRange(start.startRange.start, end.endRange.end)
          }
        m = m.updated(pairName, TemporalAlgebra.add(m.getOrElse(pairName, Nil), combined))
      }
    }
    SOut(m, approx)
  }

  /** internal And dispatch honoring rangePairs on EVERY And node (the
    * reference visitor carries validParamRanges as instance state). */
  private def visitWithPairs(n: Node, rangePairs: List[(String, String)]): Out = n match {
    case And(children0) =>
      // children themselves may contain nested Ands needing the post-pass
      val children = children0.map {
        case a: And => val s = visitWithPairs(a, rangePairs); Rewritten(s)
        case o: Or  => Rewritten(visitWithPairs(o, rangePairs))
        case n2: Not => Rewritten(visitWithPairs(n2, rangePairs))
        case other  => other
      }
      visitAnd(children, rangePairs)
    case Or(children) =>
      var m = ListMap.empty[String, List[TemporalRange]]
      var approx = false
      for (c <- children) visitWithPairs(c, rangePairs) match {
        case COut(Cons(rs, name, true)) =>
          m = m.updated(name, TemporalAlgebra.merge(m.getOrElse(name, Nil), rs))
        case SOut(es, a) =>
          approx |= a
          for ((k, v) <- es) m = m.updated(k, TemporalAlgebra.merge(m.getOrElse(k, Nil), v))
        case _ =>
      }
      SOut(m, approx)
    case Not(child) => visitWithPairs(child, rangePairs) match {
      case COut(Cons(rs, name, true)) => COut(Cons(complement(rs), name, param = true))
      case SOut(es, a) => SOut(es.map { case (k, v) => k -> complement(v) }, a)
      case other => other
    }
    case other => visit(other)
  }

  /** a pre-visited subtree carried into visitAnd. */
  private final case class Rewritten(out: Out) extends Node

  /** the tests' direct `filter.accept(visitor, null)` — raw visit with the
    * visitor's configured range pairs (addRangeVariables). */
  def visitRaw(n: Node, rangePairs: List[(String, String)] = Nil): Out =
    visitWithPairs(n, rangePairs)

  /** getConstraints(filter): the raw visit lifted to a set, then the
    * single-sided range-pair completion (lines 108-138). */
  def getConstraints(n: Node, rangePairs: List[(String, String)] = Nil): ConsSet = {
    val raw: SOut = visitWithPairs(n, rangePairs) match {
      case s: SOut => s
      case COut(Cons(rs, name, true)) => SOut(ListMap(name -> rs), approx = false)
      case _ => SOut(ListMap.empty, approx = false)
    }
    var m = raw.entries
    var approx = raw.approx
    for ((sName, eName) <- rangePairs) {
      if (m.contains(sName) || m.contains(eName)) {
        val start = plain(m.getOrElse(sName, m.getOrElse(eName, Nil)))
        val end = plain(m.getOrElse(eName, start.ranges))
        m = m - sName - eName
        val pairName = s"${sName}_$eName"
        val whole = TemporalRange(start.startRange.start, end.endRange.end)
        m = m.updated(pairName,
          TemporalAlgebra.findIntersections(m.getOrElse(pairName, Nil), List(whole)))
      }
    }
    ConsSet(m, exact = !approx)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.TimeFilterExtract._
import graft.index.TemporalAlgebra.{TemporalRange, StartTime, EndTime}

/**
 * Port of the reference's ExtractTimeFilterVisitorTest (extensions/adapters/
 * vector/.../plugin/ExtractTimeFilterVisitorTest.java:1-814) — every literal
 * expectation reproduced: the ±1 ms exclusivity adjustments, period
 * exclusivity, AND-intersection (incl. the contradictory-AND
 * empty-entry-reads-as-full quirk), OR-union, the NOT complement with
 * retained boundary points, and the start/end range-variable collapse.
 */
class TimeFilterExtractSpec extends AnyFunSuite {

  private def iso(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  private val t0519_2032 = iso("2005-05-19T20:32:56Z")
  private val t0519_2132 = iso("2005-05-19T21:32:56Z")
  private val t0520_2032 = iso("2005-05-20T20:32:56Z")
  private val t0517_2032 = iso("2005-05-17T20:32:56Z")
  private val t0518_2032 = iso("2005-05-18T20:32:56Z")

  private def cons(out: Out): Cons = out match {
    case COut(c) => c
    case other   => fail(s"expected constraints, got $other")
  }
  private def set(out: Out): ConsSet = out match {
    case SOut(es, approx) => ConsSet(es, exact = !approx)
    case other            => fail(s"expected a constraints set, got $other")
  }

  test("testAfter: when after t => [t+1, END] named when") {
    val r = cons(visitRaw(After(Prop("when"), Lit(t0519_2032))))
    assert(r.startRange.start === t0519_2032 + 1)
    assert(r.name === "when")
  }

  test("testGreaterThan: all three literal/property arrangements") {
    // when > t
    val r1 = cons(visitRaw(Gt(Prop("when"), Lit(t0519_2032))))
    assert(r1.startRange.start === t0519_2032 + 1)
    assert(r1.endRange.end === EndTime)
    assert(r1.name === "when")
    // t < when  (value-on-left mirror of the same predicate)
    val r2 = cons(visitRaw(Lt(Lit(t0519_2032), Prop("when"))))
    assert(r2.startRange.start === t0519_2032 + 1)
    assert(r2.endRange.end === EndTime)
    assert(r2.name === "when")
    // t <= when
    val r3 = cons(visitRaw(Le(Lit(t0519_2032), Prop("when"))))
    assert(r3.startRange.start === t0519_2032)
    assert(r3.endRange.end === EndTime)
    assert(r3.name === "when")
  }

  test("testLessThan: when < t => [START, t-1]; mirrored value forms") {
    val r1 = cons(visitRaw(Lt(Prop("when"), Lit(t0519_2132))))
    assert(r1.startRange.start === StartTime)
    assert(r1.endRange.end === t0519_2132 - 1)
    assert(r1.name === "when")
    // t > when
    val r2 = cons(visitRaw(Gt(Lit(t0519_2132), Prop("when"))))
    assert(r2.startRange.start === StartTime)
    assert(r2.endRange.end === t0519_2132 - 1)
    assert(r2.name === "when")
    // t >= when
    val r3 = cons(visitRaw(Ge(Lit(t0519_2132), Prop("when"))))
    assert(r3.startRange.start === StartTime)
    assert(r3.endRange.end === t0519_2132)
    assert(r3.name === "when")
  }

  test("testLessAndGreaterThan: contradictory AND reads as full; consistent AND intersects; mixed attributes split") {
    // when > 21:32 and when < 20:32 — contradiction: empty entry READS full
    val s1 = set(visitRaw(And(List(
      Gt(Prop("when"), Lit(t0519_2132)), Lt(Prop("when"), Lit(t0519_2032))))))
    assert(s1.startRangeFor("when").start === StartTime)
    assert(s1.endRangeFor("when").end === EndTime)
    assert(s1.rangesFor("when").isEmpty)
    // when < 21:32 and when > 20:32 — [t+1, t2-1]
    val s2 = set(visitRaw(And(List(
      Lt(Prop("when"), Lit(t0519_2132)), Gt(Prop("when"), Lit(t0519_2032))))))
    assert(s2.startRangeFor("when").start === t0519_2032 + 1)
    assert(s2.endRangeFor("when").end === t0519_2132 - 1)
    // sometime < 21:32 and when > 20:32 — separate entries
    val s3 = set(visitRaw(And(List(
      Lt(Prop("sometime"), Lit(t0519_2132)), Gt(Prop("when"), Lit(t0519_2032))))))
    assert(s3.startRangeFor("when").start === t0519_2032 + 1)
    assert(s3.endRangeFor("when").end === EndTime)
    assert(s3.startRangeFor("sometime").start === StartTime)
    assert(s3.endRangeFor("sometime").end === t0519_2132 - 1)
    // value-on-left forms of the same mixed filter
    val s4 = set(visitRaw(And(List(
      Gt(Lit(t0519_2132), Prop("when")), Lt(Lit(t0519_2032), Prop("sometime"))))))
    assert(s4.startRangeFor("when").start === StartTime)
    assert(s4.endRangeFor("when").end === t0519_2132 - 1)
    assert(s4.startRangeFor("sometime").start === t0519_2032 + 1)
    assert(s4.endRangeFor("sometime").end === EndTime)
  }

  test("testEqual: when = t => [t, t]") {
    val r = cons(visitRaw(Eq(Prop("when"), Lit(t0519_2132))))
    assert(r.startRange.start === t0519_2132)
    assert(r.endRange.end === t0519_2132)
  }

  test("testDuring: periods are exclusive on both ends") {
    val r = cons(visitRaw(During(Prop("when"), PeriodLit(t0519_2032, t0519_2132))))
    assert(r.startRange.start === t0519_2032 + 1)
    assert(r.startRange.end === t0519_2132 - 1)
    assert(r.name === "when")
  }

  test("testBefore: when before t => [START, t-1]") {
    val r = cons(visitRaw(Before(Prop("when"), Lit(t0519_2032))))
    assert(r.startRange.start === StartTime)
    assert(r.startRange.end === t0519_2032 - 1)
  }

  test("testBeforeOrDuring: union keeps the period's exclusive end") {
    val s = set(visitRaw(Or(List(
      Before(Prop("when"), PeriodLit(t0519_2032, t0519_2132)),
      During(Prop("when"), PeriodLit(t0519_2032, t0519_2132))))))
    assert(s.startRangeFor("when").start === StartTime)
    assert(s.endRangeFor("when").end === t0519_2132 - 1)
  }

  test("testDuringOrAfter: union keeps the period's exclusive start") {
    val s = set(visitRaw(Or(List(
      During(Prop("when"), PeriodLit(t0519_2032, t0519_2132)),
      After(Prop("when"), PeriodLit(t0519_2032, t0519_2132))))))
    assert(s.startRangeFor("when").start === t0519_2032 + 1)
    assert(s.endRangeFor("when").end === EndTime)
  }

  test("testAndOverlap: before+after window; one-sided when attributes differ") {
    val s1 = set(visitRaw(And(List(
      Before(Prop("when"), Lit(t0520_2032)), After(Prop("when"), Lit(t0519_2032))))))
    assert(s1.startRangeFor("when").start === t0519_2032 + 1)
    assert(s1.startRangeFor("when").end === t0520_2032 - 1)
    val s2 = set(visitRaw(And(List(
      Before(Prop("sometime"), Lit(t0520_2032)), After(Prop("when"), Lit(t0519_2032))))))
    assert(s2.startRangeFor("when").start === t0519_2032 + 1)
    assert(s2.startRangeFor("when").end === EndTime)
    val s3 = set(visitRaw(And(List(
      Before(Prop("when"), Lit(t0520_2032)), After(Prop("sometime"), Lit(t0519_2032))))))
    assert(!s3.isEmptySet)
    assert(s3.startRangeFor("when").start === StartTime)
    assert(s3.startRangeFor("when").end === t0520_2032 - 1)
  }

  test("testAndNoOverlap: provably-disjoint AND makes the set empty") {
    val s = set(visitRaw(And(List(
      Before(Prop("when"), Lit(t0517_2032)), After(Prop("when"), Lit(t0519_2032))))))
    assert(s.isEmptySet)
  }

  test("testOr: two disjoint ranges survive; mixed attributes union separately") {
    val s1 = set(visitRaw(Or(List(
      Before(Prop("when"), Lit(t0517_2032)), After(Prop("when"), Lit(t0519_2032))))))
    assert(s1.startRangeFor("when").end === t0517_2032 - 1)
    assert(s1.rangesFor("when")(1).start === t0519_2032 + 1)
    val s2 = set(visitRaw(Or(List(
      Before(Prop("when"), Lit(t0517_2032)), After(Prop("sometime"), Lit(t0519_2032))))))
    assert(s2.startRangeFor("when").end === t0517_2032 - 1)
    assert(s2.endRangeFor("when").start === StartTime)
    assert(s2.startRangeFor("sometime").end === EndTime)
    assert(s2.endRangeFor("sometime").start === t0519_2032 + 1)
  }

  test("testNotBetween: NOT of a disjoint OR closes the gap, boundary points retained") {
    val s = set(visitRaw(Not(Or(List(
      Before(Prop("when"), Lit(t0517_2032)), After(Prop("when"), Lit(t0519_2032)))))))
    assert(s.startRangeFor("when").start === t0517_2032 - 1)
    assert(s.startRangeFor("when").end === (t0519_2032 + 1) - 1)
  }

  test("testNotOutliers: NOT of a window splits around it; per-attribute NOT on mixed sets") {
    val sTime = t0519_2032 + 1; val eTime = t0520_2032 - 1
    val s1 = set(visitRaw(Not(And(List(
      Before(Prop("when"), Lit(t0520_2032)), After(Prop("when"), Lit(t0519_2032)))))))
    assert(s1.startRangeFor("when").start === StartTime)
    assert(s1.startRangeFor("when").end === sTime - 1)
    assert(s1.rangesFor("when")(1).start === eTime)
    assert(s1.rangesFor("when")(1).end === EndTime)
    val s2 = set(visitRaw(Not(And(List(
      Before(Prop("sometime"), Lit(t0520_2032)), After(Prop("when"), Lit(t0519_2032)))))))
    assert(s2.endRangeFor("when").end === sTime - 1)
    assert(s2.endRangeFor("when").start === StartTime)
  }

  test("testMixedRanges: separate attrs; range-pair collapse in AND; OR of two windows; single-sided completion") {
    val stime = t0519_2032 + 1; val etime = t0520_2032 - 1
    // plain visitor, INCLUDE conjunct ignored: separate start/end entries
    val s1 = set(visitRaw(And(List(NonTemporal,
      And(List(Gt(Prop("start"), Lit(t0519_2032)), Lt(Prop("end"), Lit(t0520_2032))))))))
    assert(s1.startRangeFor("start").start === stime)
    assert(s1.endRangeFor("end").end === etime)
    // range visitor: OR of two AND windows → two start_end ranges
    val stime1 = t0517_2032 + 1; val etime1 = t0518_2032 - 1
    val pairs = List(("start", "end"))
    val s2 = set(visitRaw(And(List(NonTemporal, Or(List(
      And(List(Lt(Prop("start"), Lit(t0518_2032)), Gt(Prop("end"), Lit(t0517_2032)))),
      And(List(Lt(Prop("start"), Lit(t0520_2032)), Gt(Prop("end"), Lit(t0519_2032)))))))),
      pairs))
    assert(s2.startRangeFor("start_end").start === stime1)
    assert(s2.startRangeFor("start_end").end === etime1)
    assert(s2.endRangeFor("start_end").start === stime)
    assert(s2.endRangeFor("start_end").end === etime)
    // open-ended query WITHOUT range pairs: absent start_end reads full
    val s3 = set(visitRaw(And(List(NonTemporal,
      And(List(Lt(Prop("start"), Lit(t0520_2032)), Gt(Prop("end"), Lit(t0519_2032))))))))
    assert(!s3.isEmptySet)
    assert(s3.startRangeFor("start_end").start === StartTime)
    assert(s3.endRangeFor("start_end").end === EndTime)
  }

  test("getConstraints: single-sided range pair completes with the other side") {
    // start > t alone, with ("start","end") declared: whole-row [t+1, END]
    val s = getConstraints(Gt(Prop("start"), Lit(t0519_2032)), List(("start", "end")))
    assert(s.rangesFor("start_end") === List(TemporalRange(t0519_2032 + 1, EndTime)))
    assert(!s.hasConstraintsFor("start"))
    assert(s.exact)
  }

  test("quirks preserved: TEquals is unnamed; NOT of empty is empty; NE merges through the shared endpoint") {
    // tequals returns the literal's PLAIN constraints — extracts nothing at set level
    val r = cons(visitRaw(TEquals(Prop("when"), Lit(t0519_2032))))
    assert(!r.param && r.ranges === List(TemporalRange(t0519_2032, t0519_2032)))
    assert(getConstraints(TEquals(Prop("when"), Lit(t0519_2032))).entries.isEmpty)
    // not of a non-temporal (empty plain) passes through
    assert(cons(visitRaw(Not(NonTemporal))).ranges.isEmpty)
    // when <> t: [START,t] + [t,END] merge at the INCLUSIVE shared endpoint → full
    val ne = cons(visitRaw(Ne(Prop("when"), Lit(t0519_2032))))
    assert(ne.ranges === List(TemporalRange(StartTime, EndTime)))
  }
}

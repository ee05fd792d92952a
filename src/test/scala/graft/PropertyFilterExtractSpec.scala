package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.PropertyFilterExtract._

/**
 * Port of the reference's PropertyFilterVisitorTest (extensions/adapters/
 * vector/.../query/cql/PropertyFilterVisitorTest.java:23-151) against
 * [[graft.index.PropertyFilterExtract]]: the CQL strings are pre-parsed to
 * the AST the CQL library would hand the visitor (GeoTools parses integer
 * literals as Longs; `h between 4 and 6` is PropertyIsBetween; `&&` is
 * And), and every numeric/text assertion — bounds, Java sentinel values,
 * inclusivity after the k/l merges, case-sensitivity flags — is the
 * reference test's, literally.
 */
class PropertyFilterExtractSpec extends AnyFunSuite {

  private def num(cs: ConstraintSet, f: String): NumericConstraint =
    cs.byId(f).get.asInstanceOf[NumericConstraint]

  test("testNumbersTypes: sentinels, subclass kinds and merge inclusivity") {
    // "a < 9 and c == 12 and e >= 11 and f <= 12 and g > 13 and
    //  h between 4 and 6 and k > 4 and k < 6 and l >= 4 and l <= 6"
    val filter = And(List(
      Lt(Prop("a"), NumLit.long(9)),
      Eq(Prop("c"), NumLit.long(12)),
      Ge(Prop("e"), NumLit.long(11)),
      Le(Prop("f"), NumLit.long(12)),
      Gt(Prop("g"), NumLit.long(13)),
      Between(Prop("h"), NumLit.long(4), NumLit.long(6)),
      Gt(Prop("k"), NumLit.long(4)),
      Lt(Prop("k"), NumLit.long(6)),
      Ge(Prop("l"), NumLit.long(4)),
      Le(Prop("l"), NumLit.long(6))))
    val cs = getConstraints(filter)

    // a < 9 → NumericLessThanConstraint: [Double.MIN_VALUE, 9)
    val a = num(cs, "a")
    assert(a.kind === KLt)
    assert(a.lower.v === java.lang.Double.MIN_VALUE) // positive subnormal, NOT -inf
    assert(a.upper.v === 9.0 && !a.inclusiveHigh && a.inclusiveLow)

    // e >= 11 → [11, Double.MAX_VALUE], both inclusive
    val e = num(cs, "e")
    assert(e.lower.v === 11.0 && e.upper.v === java.lang.Double.MAX_VALUE)
    assert(e.inclusiveHigh && e.inclusiveLow)

    // c == 12 → NumericEqualsConstraint [12, 12]
    val c = num(cs, "c")
    assert(c.kind === KEq)
    assert(c.lower.v === 12.0 && c.upper.v === 12.0 && c.inclusiveHigh && c.inclusiveLow)

    // g > 13 → (13, MAX]
    val g = num(cs, "g")
    assert(g.lower.v === 13.0 && g.upper.v === java.lang.Double.MAX_VALUE)
    assert(g.inclusiveHigh && !g.inclusiveLow)

    // f <= 12 → [MIN_VALUE, 12], both inclusive
    val f = num(cs, "f")
    assert(f.upper.v === 12.0 && f.lower.v === java.lang.Double.MIN_VALUE)
    assert(f.inclusiveHigh && f.inclusiveLow)

    // h between 4 and 6 → [4, 6] closed
    val h = num(cs, "h")
    assert(h.lower.v === 4.0 && h.upper.v === 6.0 && h.inclusiveHigh && h.inclusiveLow)

    // k > 4 and k < 6 — the INTERSECT path: (4, 6) open on both ends
    // (each kept bound keeps its OWN inclusivity; the Long-vs-Double
    // sentinel never value-equals, so the `lowEquals` arm stays off)
    val k = num(cs, "k")
    assert(k.kind === KRange) // merged → base NumericQueryConstraint
    assert(k.lower.v === 4.0 && k.upper.v === 6.0)
    assert(!k.inclusiveHigh && !k.inclusiveLow)

    // l >= 4 and l <= 6 → [4, 6] closed through the same merge
    val l = num(cs, "l")
    assert(l.lower.v === 4.0 && l.upper.v === 6.0 && l.inclusiveHigh && l.inclusiveLow)
  }

  test("testTextTypes: equality range, LIKE, and the text-comparison TODO") {
    // "b == '10' and d like '%d' && f > '10'"
    val filter = And(List(
      Eq(Prop("b"), StrLit("10")),
      Like(Prop("d"), "%d", matchCase = true),
      Gt(Prop("f"), StrLit("10"))))
    val cs = getConstraints(filter)

    val b = cs.byId("b").get.asInstanceOf[TextRangeConstraint]
    assert(b.start === "10" && b.end === "10" && b.caseSensitive)

    val d = cs.byId("d").get.asInstanceOf[LikeConstraint]
    assert(d.expression === "%d" && d.caseSensitive)

    // ordered text comparison extracts nothing (the reference's TODO)
    assert(cs.byId("f").isEmpty)
  }

  test("union inclusivity ORs on equal bounds; intersect ANDs (NumericQueryConstraint.java:66-118)") {
    val ge4 = NumericConstraint("x", Num.dbl(4.0), Num.dbl(6.0), inclusiveLow = true, inclusiveHigh = false, KRange)
    val gt4 = NumericConstraint("x", Num.dbl(4.0), Num.dbl(6.0), inclusiveLow = false, inclusiveHigh = true, KRange)
    val i = ge4.intersectC(gt4).asInstanceOf[NumericConstraint]
    assert(!i.inclusiveLow && !i.inclusiveHigh) // AND on both value-equal ends
    val u = ge4.unionC(gt4).asInstanceOf[NumericConstraint]
    assert(u.inclusiveLow && u.inclusiveHigh) // OR on both
    // Long 4 never value-equals Double 4.0 (Java Number.equals) — the
    // surviving bound keeps its own inclusivity instead
    val geL = NumericConstraint("x", Num.long(4), Num.dbl(6.0), inclusiveLow = true, inclusiveHigh = true, KRange)
    val gtD = NumericConstraint("x", Num.dbl(4.0), Num.dbl(6.0), inclusiveLow = false, inclusiveHigh = true, KRange)
    val m = geL.intersectC(gtD).asInstanceOf[NumericConstraint]
    assert(m.lower.v === 4.0 && m.inclusiveLow) // this.lower kept (not <), own flag
  }

  test("text range merges: endpoint max/min with case flags AND/OR (FilterableTextRangeConstraint.java:118-150)") {
    val r1 = TextRangeConstraint("t", "dan", "derek", caseSensitive = true)
    val r2 = TextRangeConstraint("t", "dave", "dz", caseSensitive = false)
    val i = r1.intersectC(r2).asInstanceOf[TextRangeConstraint]
    assert(i.start === "dave" && i.end === "derek" && !i.caseSensitive)
    val u = r1.unionC(r2).asInstanceOf[TextRangeConstraint]
    assert(u.start === "dan" && u.end === "dz" && u.caseSensitive)
    // equality ctor folds when insensitive
    val eqI = TextRangeConstraint.equalsTo("t", "MiXeD", caseSensitive = false)
    assert(eqI.start === "mixed" && eqI.end === "mixed")
  }

  test("Or unions per attribute; Not and non-property arms contribute empty sets") {
    val n = Or(List(
      Between(Prop("x"), NumLit.long(1), NumLit.long(2)),
      Between(Prop("x"), NumLit.long(5), NumLit.long(6)),
      Not(Between(Prop("x"), NumLit.long(9), NumLit.long(10)))))
    val x = num(getConstraints(n), "x")
    assert(x.lower.v === 1.0 && x.upper.v === 6.0) // union spans, Not ignored
    // And skips the Ne arm entirely (it returns a bare field id upstream)
    val cs2 = getConstraints(And(List(Ne(Prop("y"), NumLit.long(3)), NonProperty)))
    assert(cs2.byId("y").isEmpty && cs2.entries.isEmpty)
  }

  test("LIKE filter accept semantics (FilterableLikeConstraintTest.java:19-100)") {
    val cs1 = LikeConstraint("f", "fRed%dog", caseSensitive = true)
    assert(cs1.accept("fReddog") && cs1.accept("fRedfkfdog"))
    assert(!cs1.accept("fredddog") && !cs1.accept("xRedddog"))
    val cs2 = LikeConstraint("f", "fRed%", caseSensitive = true)
    assert(cs2.accept("fReddog") && cs2.accept("fRedfkfdog"))
    assert(!cs2.accept("fredddog") && !cs2.accept("xRedddog"))
    val ci1 = LikeConstraint("f", "fRed%dog", caseSensitive = false)
    assert(ci1.accept("fReddog") && ci1.accept("fRedfkfdog") && ci1.accept("freddDog"))
    assert(!ci1.accept("xRedddog"))
    val ci2 = LikeConstraint("f", "fRed%", caseSensitive = false)
    assert(ci2.accept("fReddog") && ci2.accept("fRedfkfdog") && ci2.accept("freddDog"))
    assert(!ci2.accept("xRedddog"))
  }
}

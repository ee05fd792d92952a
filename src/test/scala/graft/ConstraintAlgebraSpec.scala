package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap
import graft.index.ConstraintAlgebra._

/**
 * Port of the reference's BasicQueryTest (core/store/.../query/
 * BasicQueryTest.java:40-330) against [[graft.index.ConstraintAlgebra]]:
 * the isSupported default rule, the intersect merge case, the disjoint
 * OR case with its binary round-trip, and the generated filter's
 * accept truth table (incl. the OR arm).
 */
class ConstraintAlgebraSpec extends AnyFunSuite {

  private val one = "one"; private val two = "two"; private val three = "three"
  private val indexDims = Set(one, two)
  private val strategyDims = Seq(one, two)

  test("testIsSupported: defaults are not mandatory, non-defaults are") {
    var cs1 = ConstraintSet.empty
    assert(cs1.isSupported(indexDims)) // empty set supported
    cs1 = cs1.addConstraint(one, ConstraintData(0.3, 0.5, isDefault = true))
    cs1 = cs1.addConstraint(two, ConstraintData(0.3, 0.5, isDefault = true))
    assert(cs1.isSupported(indexDims))
    cs1 = cs1.addConstraint(three, ConstraintData(0.3, 0.5, isDefault = true))
    assert(cs1.isSupported(indexDims)) // default on a missing dim: fine
    val cs2 = ConstraintSet.empty.addConstraint(three, ConstraintData(0.3, 0.5, isDefault = false))
    assert(!cs2.isSupported(indexDims)) // non-default on a missing dim: not
  }

  test("testIntersectCasesWithPersistence: per-dimension merge spans, binary round-trips") {
    val cs1 = ConstraintSet.empty
      .addConstraint(one, ConstraintData(0.3, 0.5, isDefault = true))
      .addConstraint(two, ConstraintData(0.4, 0.7, isDefault = true))
    val cs2a = ConstraintSet.empty
      .addConstraint(two, ConstraintData(0.1, 0.2, isDefault = true))
    val constraints = Constraints(List(cs2a)).merge(Constraints(List(cs1)))
    assert(constraints.indexConstraints(strategyDims) ===
      List(Seq((0.3, 0.5), (0.1, 0.7))))
    // the reference's toBinary/fromBinary layout round-trips each set
    val rt = Constraints(constraints.sets.map(s => ConstraintSet.fromBinary(s.toBinary)))
    assert(rt.indexConstraints(strategyDims) === constraints.indexConstraints(strategyDims))
    assert(rt.matches(constraints))
  }

  test("testDisjointCasesWithPersistence: OR cubes, addConstraint merges, filter truth table") {
    // two ranges added to ONE set merge-span (they do not OR)
    val cs1 = ConstraintSet.empty
      .addConstraint(one, ConstraintData(0.3, 0.5, isDefault = true))
      .addConstraint(one, ConstraintData(0.4, 0.7, isDefault = true))
    val cs2a = ConstraintSet.empty
      .addConstraint(two, ConstraintData(0.1, 0.2, isDefault = true))
      .addConstraint(two, ConstraintData(2.1, 2.3, isDefault = true))
    val cs2b = ConstraintSet.empty
      .addConstraint(two, ConstraintData(3.4, 3.7, isDefault = true))
    val constraints = Constraints(List(cs2a, cs2b)).merge(Constraints(List(cs1)))
    assert(constraints.indexConstraints(strategyDims) === List(
      Seq((0.3, 0.7), (0.1, 2.3)),
      Seq((0.3, 0.7), (3.4, 3.7))))
    // merged spans cleared their default flags; the untouched cs2b range
    // (never merged) keeps its original default marker
    assert(constraints.sets.flatMap(_.entries.get(one)).forall(!_.isDefault))
    assert(!constraints.sets.head.entries(two).isDefault) // [0.1,2.3] merged
    assert(constraints.sets(1).entries(two).isDefault)    // [3.4,3.7] as added
    // binary round-trip preserves the cubes
    val rt = Constraints(constraints.sets.map(s => ConstraintSet.fromBinary(s.toBinary)))
    assert(rt.indexConstraints(strategyDims) === constraints.indexConstraints(strategyDims))

    // ONE filter for the whole Constraints; accept = OR over cubes
    def row(o: Double, t: Double) = Map(one -> (o, o), two -> (t, t))
    assert(accepts(constraints, strategyDims, row(0.4, 0.5)))   // first cube
    assert(!accepts(constraints, strategyDims, row(0.1, 0.5)))  // one misses
    assert(!accepts(constraints, strategyDims, row(0.4, 5.0)))  // two misses both
    assert(accepts(constraints, strategyDims, row(0.4, 3.5)))   // the OR case
  }

  test("merge identities, fuzzy intersects, and the unconstrained-dimension empty cube") {
    val a = Constraints(List(ConstraintSet.empty.addConstraint(one, ConstraintData(0, 1, isDefault = false))))
    assert(a.merge(Constraints.empty) eq a)
    assert(Constraints.empty.merge(a) === a)
    // all-or-nothing: a set missing a strategy dimension contributes no cube
    assert(a.indexConstraints(strategyDims) === Nil)
    // fuzzy endpoint touch within 1e-12 intersects
    val cd1 = ConstraintData(0.0, 0.5, isDefault = false)
    val cd2 = ConstraintData(0.5 + 1e-13, 0.9, isDefault = false)
    assert(cd1.intersects(cd2) && cd2.intersects(cd1))
    assert(!cd1.intersects(ConstraintData(0.6, 0.9, isDefault = false)))
    // identical-range merge keeps THIS side's default flag
    val kept = ConstraintData(0.1, 0.2, isDefault = true).merge(ConstraintData(0.1, 0.2, isDefault = false))
    assert(kept.isDefault)
    // CONTAINS vs OVERLAPS compare semantics
    assert(compare(Overlaps, 0.25, 0.35, 0.3, 0.4) && !compare(Contains, 0.25, 0.35, 0.3, 0.4))
    assert(compare(Contains, 0.31, 0.35, 0.3, 0.4))
  }

  test("fuzz: cross-product merge over DISJOINT dimension sets is pointwise AND (200 instances)") {
    // the composition the reference uses merge for — a time window put on
    // each spatial cube — has disjoint per-side dimensions; there the
    // cross-product of per-set merges must accept exactly the points both
    // sides accept (per-dimension spans never fire because no dimension
    // appears on both sides)
    val rnd = new scala.util.Random(20260818L)
    val dimsA = Seq("one", "two"); val dimsB = Seq("three")
    val allDims = dimsA ++ dimsB
    // every dimension constrained: the AND identity needs nonempty cubes
    // on both sides (an empty cube accepts nothing pre-merge but vanishes
    // from the merged set — the reference shares that asymmetry)
    def randSet(dims: Seq[String]): ConstraintSet =
      dims.foldLeft(ConstraintSet.empty) { (s, d) =>
        val a = rnd.nextDouble() * 10 - 5; val b = a + rnd.nextDouble() * 3
        s.addConstraint(d, ConstraintData(a, b, isDefault = rnd.nextBoolean()))
      }
    for (_ <- 1 to 200) {
      val ca = Constraints(List.fill(1 + rnd.nextInt(3))(randSet(dimsA)))
      val cb = Constraints(List.fill(1 + rnd.nextInt(3))(randSet(dimsB)))
      val merged = ca.merge(cb)
      for (_ <- 1 to 20) {
        val pt = allDims.map(d => d -> { val v = rnd.nextDouble() * 12 - 6; (v, v) }).toMap
        val expected = accepts(ca, allDims, pt) && accepts(cb, allDims, pt)
        assert(accepts(merged, allDims, pt) === expected,
          s"merged accept diverged at $pt\nA=$ca\nB=$cb")
      }
    }
  }

  test("a cube constraining only off-model dimensions accepts NOTHING, not everything") {
    // the reference trims off-model dims; a zero-dimension filter falls
    // through its (empty) loop and rejects (BinnedNumericDataset.applyBins
    // yields an empty array for zero dimensions)
    val offModel = ConstraintSet.empty.addConstraint(three, ConstraintData(0, 1, isDefault = false))
    val inModel = ConstraintSet.empty.addConstraint(one, ConstraintData(0.3, 0.5, isDefault = false))
    def row(o: Double) = Map(one -> (o, o), two -> (o, o))
    // off-model-only constraints: no row passes
    assert(!accepts(Constraints(List(offModel)), strategyDims, row(0.4)))
    // OR with a real cube: only the real cube's matches pass
    val both = Constraints(List(offModel, inModel))
    assert(accepts(both, strategyDims, row(0.4)))
    assert(!accepts(both, strategyDims, row(0.9)))
  }
}

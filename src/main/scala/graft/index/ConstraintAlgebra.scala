package graft.index

import scala.collection.immutable.ListMap

/**
 * The reference's core query-constraint composition model — the port of
 * BasicQuery's Constraints / ConstraintSet / ConstraintData
 * (core/store/.../query/BasicQuery.java:30-470) and the BasicQueryFilter
 * hyper-cube accept (core/store/.../filter/BasicQueryFilter.java:20-160):
 * a query is an OR-list of ConstraintSets, each set one hyper-cube of
 * per-dimension ranges; composing two queries (e.g. a multi-polygon's
 * spatial cubes with a temporal window) is `Constraints.merge` — the
 * cross-product of per-set merges.
 *
 * Faithful-port notes (pinned by ConstraintAlgebraSpec's BasicQueryTest
 * port):
 *  - Dimensions are identified by NAME here where the reference keys on
 *    `Class<? extends NumericDimensionDefinition>` — the identity
 *    semantics (exact key equality) are unchanged.
 *  - `ConstraintData.merge`: identical ranges keep THIS side's isDefault;
 *    different ranges union-span and clear isDefault
 *    (BasicQuery.java:300-318, incl. its open TODO).
 *  - `addConstraint` on an already-constrained dimension MERGES (so two
 *    ranges added to one set span, they do not OR — BasicQuery.java:73-86).
 *  - `intersects`/`matches` use the 1e-12 fuzzy tolerance
 *    (DOUBLE_TOLERANCE, BasicQuery.java:33,286-299).
 *  - `getIndexConstraints` is all-or-nothing per set: any strategy
 *    dimension with no constraint empties the whole cube
 *    (BasicQuery.java:150-173); Constraints-level drops empty cubes.
 *  - `isSupported`: every NON-default constrained dimension must exist in
 *    the index model; defaults are not mandatory (BasicQuery.java:175-196).
 *  - to/fromBinary keep the reference layout: entry-count int, then per
 *    entry [name-length int ‖ UTF-8 name ‖ min double ‖ max double ‖
 *    isDefault short] (BasicQuery.java:213-273).
 *  - the filter accepts a row iff ANY cube accepts it, a cube iff EVERY
 *    constrained dimension compares true; OVERLAPS is
 *    `!(dataMax < qMin || dataMin > qMax)`, CONTAINS is
 *    `!(dataMin < qMin || dataMax > qMax)` (BasicQueryFilter enum).
 */
object ConstraintAlgebra {

  private val Tolerance = 1e-12

  private def fuzzyEquals(a: Double, b: Double): Boolean =
    math.abs(a - b) <= Tolerance || a == b

  /** ConstraintData: one dimension's range + the is-default marker
    * (defaults are full-domain placeholders a query may leave behind). */
  final case class ConstraintData(min: Double, max: Double, isDefault: Boolean) {
    def intersects(cd: ConstraintData): Boolean =
      (cd.min < max || fuzzyEquals(cd.min, max)) &&
        (cd.max > min || fuzzyEquals(cd.max, min))
    def merge(cd: ConstraintData): ConstraintData =
      if (min == cd.min && max == cd.max) ConstraintData(min, max, isDefault)
      else ConstraintData(math.min(cd.min, min), math.max(cd.max, max), isDefault = false)
    /** range equality under the fuzzy tolerance, default flag ignored. */
    def matches(o: ConstraintData): Boolean =
      fuzzyEquals(min, o.min) && fuzzyEquals(max, o.max)
  }

  /** ConstraintSet: one hyper-cube — per-dimension-name constraint data. */
  final case class ConstraintSet(entries: ListMap[String, ConstraintData]) {
    def isEmpty: Boolean = entries.isEmpty
    def addConstraint(dim: String, cd: ConstraintData): ConstraintSet =
      ConstraintSet(entries.updated(dim, entries.get(dim).map(_.merge(cd)).getOrElse(cd)))
    def merge(o: ConstraintSet): ConstraintSet = {
      val merged = o.entries.map { case (dim, cd) =>
        dim -> entries.get(dim).map(_.merge(cd)).getOrElse(cd)
      }
      ConstraintSet(entries.filterNot(e => o.entries.contains(e._1)) ++ merged)
    }
    def matches(o: ConstraintSet): Boolean =
      o.isEmpty == isEmpty && entries.forall { case (dim, cd) =>
        o.entries.get(dim).exists(cd.matches)
      }
    def intersects(o: ConstraintSet): Boolean =
      if (o.isEmpty != isEmpty) true
      else entries.forall { case (dim, cd) => o.entries.get(dim).exists(_.intersects(cd)) }
    /** all-or-nothing cube for an ordered strategy dimension list. */
    def indexConstraints(strategyDims: Seq[String]): Option[Seq[(Double, Double)]] =
      if (entries.isEmpty) None
      else {
        val per = strategyDims.map(d => entries.get(d).map(cd => (cd.min, cd.max)))
        if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
      }
    /** defaults are not mandatory in the index model. */
    def isSupported(indexDims: Set[String]): Boolean =
      entries.forall { case (dim, cd) => indexDims.contains(dim) || cd.isDefault }

    def toBinary: Array[Byte] = {
      val parts = entries.toSeq.map { case (dim, cd) =>
        val name = dim.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val buf = java.nio.ByteBuffer.allocate(name.length + 22)
        buf.putInt(name.length).put(name).putDouble(cd.min).putDouble(cd.max)
          .putShort(if (cd.isDefault) 1.toShort else 0.toShort)
        buf.array()
      }
      val buf = java.nio.ByteBuffer.allocate(4 + parts.map(_.length).sum)
      buf.putInt(parts.size); parts.foreach(buf.put)
      buf.array()
    }
  }
  object ConstraintSet {
    val empty: ConstraintSet = ConstraintSet(ListMap.empty)
    def fromBinary(bytes: Array[Byte]): ConstraintSet = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val n = buf.getInt
      var s = empty
      for (_ <- 0 until n) {
        val name = new Array[Byte](buf.getInt); buf.get(name)
        val min = buf.getDouble; val max = buf.getDouble
        val isDefault = buf.getShort > 0
        s = ConstraintSet(s.entries.updated(
          new String(name, java.nio.charset.StandardCharsets.UTF_8),
          ConstraintData(min, max, isDefault)))
      }
      s
    }
  }

  /** Constraints: the OR-list of hyper-cubes. */
  final case class Constraints(sets: List[ConstraintSet]) {
    def isEmpty: Boolean = sets.isEmpty
    /** cross-product merge: every other set merged into EVERY current set
      * (BasicQuery.java:404-430) — the composition step that puts a time
      * window on each spatial cube of a multi-geometry query. */
    def merge(other: Constraints): Constraints =
      if (other.sets.isEmpty) this
      else if (isEmpty) other
      else Constraints(for (n <- other.sets; c <- sets) yield c.merge(n))
    def matches(o: Constraints): Boolean =
      o.isEmpty == isEmpty && sets.forall(s => o.sets.exists(s.matches))
    def isSupported(indexDims: Set[String]): Boolean =
      sets.forall(_.isSupported(indexDims))
    /** per-set cubes against an ordered strategy; empty cubes dropped. */
    def indexConstraints(strategyDims: Seq[String]): List[Seq[(Double, Double)]] =
      sets.flatMap(_.indexConstraints(strategyDims))
  }
  object Constraints {
    val empty: Constraints = Constraints(Nil)
  }

  // ---------- BasicQueryFilter compare + accept ----------

  sealed trait CompareOp
  case object Contains extends CompareOp
  case object Overlaps extends CompareOp

  def compare(op: CompareOp, dataMin: Double, dataMax: Double,
              qMin: Double, qMax: Double): Boolean = op match {
    case Contains => !((dataMin < qMin) || (dataMax > qMax))
    case Overlaps => !((dataMax < qMin) || (dataMin > qMax))
  }

  /** the generated fine filter: a row's per-dimension (min,max) data
    * accepts iff SOME cube compares true on EVERY dimension it constrains
    * within the strategy model (off-model dimensions are trimmed —
    * BasicQuery.createFilter's fieldsToTrim pass). A cube whose trimmed
    * dimension set is EMPTY accepts nothing: the reference's zero-dimension
    * filter iterates no fields and falls through to reject
    * (BinnedNumericDataset.applyBins returns an empty array for zero
    * dimensions, so BasicQueryFilter.accept's loop never fires). */
  def accepts(constraints: Constraints, strategyDims: Seq[String],
              row: Map[String, (Double, Double)],
              op: CompareOp = Overlaps): Boolean =
    constraints.sets.exists { set =>
      val trimmed = set.entries.filter { case (dim, _) => strategyDims.contains(dim) }
      trimmed.nonEmpty && trimmed.forall { case (dim, cd) =>
        row.get(dim).exists { case (dMin, dMax) =>
          compare(op, dMin, dMax, cd.min, cd.max)
        }
      }
    }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.spark.{STCoversPoint, SpatialPlanner}

/**
 * Optimizer rule: a `Filter` whose condition contains the exact
 * prepared-geometry predicate ([[STCoversPoint]]) over a relation that
 * carries a stored `cell_id` column gets the SFC range prefilter AND-ed
 * in automatically. The added comparisons are plain binary-column
 * predicates, so Catalyst pushes them into the parquet/Iceberg scan —
 * users querying the store with only the exact predicate still get
 * row-group pruning.
 *
 * This is the Spark-native form of the reference's CQL → optimal-query
 * rewrite (ExtractGeometryFilterVisitor → SpatialQuery constraints,
 * extensions/adapters/vector/.../CQLQuery.java:63-240): extract the
 * geometry from the rich filter, decompose it into key ranges, keep the
 * original filter as the residual.
 *
 * Fixpoint-safe: the rewrite only fires when the condition does not
 * already reference the cell_id attribute.
 *
 * Soundness: the geometry predicate must be a TOP-LEVEL CONJUNCT of the
 * filter condition. A predicate found under an OR or a NOT does NOT imply
 * the SFC range prefilter — `st_covers_point(...) OR p` must keep rows
 * outside the geometry's cell ranges that satisfy `p`, and
 * `NOT st_covers_point(...)` keeps exactly those rows — so those shapes
 * are left untouched.
 */
object SpatialFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val cellAttr: Option[Attribute] = child.output.find(_.name == "cell_id")
      // only a conjunct that IS the predicate (not one merely containing
      // it under Or/Not/...) licenses AND-ing the range prefilter
      val covers = splitConjunctivePredicates(cond).collect { case c: STCoversPoint => c }
      (cellAttr, covers) match {
        case (Some(attr), cs) if cs.nonEmpty && !cond.references.contains(attr) =>
          // several spatial conjuncts AND-compose: EXACT set intersection
          // of the per-geometry range sets (a point satisfying every
          // predicate lies in every geometry's decomposed coverage, so
          // the intersection is a sound prefilter and is ⊆ each single
          // geometry's ranges — strictly better pruning). Deliberately
          // NOT the reference's mergeIntersections chain, which keeps
          // isolated ranges whole and can be looser than one input.
          val sets = cs.map { c =>
            val geom = new org.locationtech.jts.io.WKBReader().read(c.wkb)
            SpatialPlanner.mergeRanges(SpatialPlanner.spatialGeometryRanges(geom))
          }
          val inter = sets.reduce(SpatialPlanner.intersectSets)
          // disjoint geometries → empty intersection; keep one set's
          // ranges rather than build a predicate over zero ranges (the
          // exact residual then rejects everything anyway)
          val ranges = if (inter.nonEmpty) inter else sets.head
          val rangePred: Expression = SpatialPlanner.rangesPredicateExpr(attr, ranges)
          Filter(And(rangePred, cond), child)
        case _ => f
      }
  }
}

/** spark-submit entry: `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * For an existing session use
  * `spark.experimental.extraOptimizations ++= Seq(SpatialFilterPushdown)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => SpatialFilterPushdown)
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.FloatVecL2Sq

/** Optimizer rule for vector-distance predicates, injected through
  * [[graft.GraftExtensions]] (the custom-Rule rung of the extension
  * ladder: expression → rule → strategy).
  *
  * - Self-distance folding: `graft_l2sq(a, a)` is identically zero (the
  *   fold sums (x-x)²), so it becomes a null-preserving constant —
  *   downstream constant folding can then kill dependent predicates
  *   (e.g. the diagonal of a self-join distance matrix).
  * - Radius strength reduction: `sqrt(graft_l2sq(a,b)) <= r` with a
  *   non-negative literal radius becomes `graft_l2sq(a,b) <= r*r` —
  *   drops a sqrt per PAIR in radius-search joins. (A 1-ulp boundary
  *   band exists when r*r rounds; acceptable for a radius predicate,
  *   same trade every strength-reducing optimizer makes.)
  */
object VectorDistanceRules extends Rule[LogicalPlan] {

  private def rSq(r: Double): Literal = Literal(r * r, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case FloatVecL2Sq(a, b) if a.semanticEquals(b) && a.deterministic =>
      If(IsNull(a), Literal(null, DoubleType), Literal(0.0, DoubleType))

    case LessThanOrEqual(Sqrt(d: FloatVecL2Sq), Literal(r: Double, DoubleType)) if r >= 0 =>
      LessThanOrEqual(d, rSq(r))
    case LessThan(Sqrt(d: FloatVecL2Sq), Literal(r: Double, DoubleType)) if r >= 0 =>
      LessThan(d, rSq(r))
    case GreaterThanOrEqual(Literal(r: Double, DoubleType), Sqrt(d: FloatVecL2Sq)) if r >= 0 =>
      GreaterThanOrEqual(rSq(r), d)
    case GreaterThan(Literal(r: Double, DoubleType), Sqrt(d: FloatVecL2Sq)) if r >= 0 =>
      GreaterThan(rSq(r), d)
  }
}

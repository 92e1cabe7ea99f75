package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the third Catalyst extension point, after expressions
  * and strategies): rewrites the classic top-k-per-group window pattern
  *
  *   Project(cols…)                       — rank column projected AWAY
  *     Filter(rn <= k)                    — k a literal
  *       Window(row_number() AS rn
  *              PARTITION BY p ORDER BY o)
  *
  * into graft's TopKPerKey operator (bounded heaps, no per-group sort).
  * Users keep writing the idiomatic window form; the engine runs the
  * O(n log k) plan. Fires only when the rank column is used for nothing
  * but the filter — otherwise the plan is left untouched. Injected via
  * `spark.experimental.extraOptimizations` or GraftExtensions. */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private def asTopK(f: Filter): Option[LogicalPlan] = f match {
    case Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _)) =>
      val k = cond match {
        case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
          if a.exprId == alias.exprId => Some(v)
        case LessThan(a: AttributeReference, Literal(v: Int, _))
          if a.exprId == alias.exprId => Some(v - 1)
        // rn = 1 ⇔ rn <= 1 (row_number is always >= 1): the dedup-keep-first idiom
        case EqualTo(a: AttributeReference, Literal(1, _))
          if a.exprId == alias.exprId => Some(1)
        case _ => None
      }
      // Spark's own InferWindowGroupLimit may already have inserted a
      // WindowGroupLimit below the Window (3.5+); TopKPerKey subsumes it
      val realChild = child match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      k.filter(_ > 0).map(TopKPerKey(part, order, _, realChild))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, f: Filter) =>
      asTopK(f) match {
        // safe only if the projection drops the rank column entirely
        case Some(topk) if projList.forall(_.references.subsetOf(topk.outputSet)) =>
          Project(projList, topk)
        case _ => p
      }
  }
}

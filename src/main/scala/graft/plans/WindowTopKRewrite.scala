package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rewrite: the ubiquitous window top-N idiom
  *
  * {{{ Project(cols, Filter(rn <= k, Window(row_number() as rn ...))) }}}
  *
  * becomes [[TopKPerKeyPlan]] whenever the rank column itself is pruned
  * by the enclosing Project — users keep writing the standard idiom and
  * get the bounded-heap plan (no per-group sort, shuffle ≤ maps × keys
  * × k) for free. Conservative by construction:
  *
  *  - only `row_number` (rank/dense_rank admit ties — different row set);
  *  - only a bare `rn <= k` / `rn < k` / `rn = 1` filter (no compound
  *    conditions);
  *  - only when no enclosing expression references the rank attribute
  *    (the heap operator does not produce rank numbers);
  *  - only with a non-empty partitionSpec (global top-N already plans
  *    as TakeOrderedAndProject).
  *
  * Injected by [[graft.GraftExtensions]]; disable with
  * `spark.graft.rewrite.windowTopK=false`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString("spark.graft.rewrite.windowTopK", "true").toBoolean) {
      return plan
    }
    plan.transformUp {
      case p @ Project(projectList,
          Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec, orderSpec, child, _)))
          if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
        val rn = alias.toAttribute
        limitOf(cond, rn) match {
          case Some(k) if k > 0 && !projectList.exists(_.references.contains(rn)) &&
              projectList.forall(_.references.subsetOf(child.outputSet)) =>
            Project(projectList, TopKPerKeyPlan(partitionSpec, orderSpec, k, child))
          case _ => p
        }
    }
  }
}

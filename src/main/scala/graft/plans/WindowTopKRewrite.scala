package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, DenseRank, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Literal, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rewrite: the ubiquitous window top-N idiom
  *
  * {{{ Project(cols, Filter(rn <= k, Window(row_number() as rn ...))) }}}
  *
  * becomes [[TopKPerKeyPlan]] whenever the rank column itself is pruned
  * by the enclosing Project — users keep writing the standard idiom and
  * get the bounded-heap plan (no per-group sort, shuffle ≤ maps × keys
  * × k) for free. With an EMPTY partitionSpec (global top-N) the same
  * idiom instead becomes `Limit(k, Sort(ord))`, which Spark plans as
  * TakeOrderedAndProject — partial per-partition top-k, no
  * single-reducer WindowExec (the "Moving all data to a single
  * partition" shape). Conservative by construction:
  *
  *  - only `row_number` takes the heap plan (rank/dense_rank admit ties
  *    — a different row set — and instead get the tie-safe
  *    [[RankPrunePlan]] treatment below);
  *  - only a bare `rn <= k` / `rn < k` / `rn = 1` filter (no compound
  *    conditions);
  *  - only when no enclosing expression references the rank attribute
  *    (the heap operator does not produce rank numbers).
  *
  * `rank()`/`dense_rank()` top-N (the other idiom users write) keeps its
  * Window — ties mean the result set isn't k rows, so no heap operator
  * can replace the exact rank computation — but gains a map-side
  * [[RankPrunePlan]] under it: a streaming tie-safe filter that discards
  * every row provably outside the top k distinct order keys of its
  * group before the window's shuffle+sort. Results are bit-identical by
  * construction (the window recomputes exact ranks over survivors, and
  * the rank attribute remains available to enclosing expressions); only
  * shuffle/sort volume changes.
  *
  * Overlap with Spark 4's builtin `InferWindowGroupLimit`: that batch
  * rewrites the same rank-filter idiom into a [[WindowGroupLimit]]
  * (map-side group-limit before the shuffle), largely subsuming this
  * prune for the builtin rank functions — RankPrunePlan remains useful
  * as a MANUAL builder (`relations.rankPrune`) and on plans the builtin
  * batch declines. When both fire, the idempotency guard must look
  * THROUGH the inserted WindowGroupLimit (it lands between Window and
  * RankPrunePlan), else a later optimizer iteration would stack a second
  * prune — sound (prunes compose) but wasted work.
  *
  * Tie-sensitivity: `row_number` over a non-total orderSpec is already
  * nondeterministic on ties — it keeps k rows by the sort's REALIZED
  * order. The heap (or TakeOrderedAndProject) may retain a different,
  * equally valid set of tied rows, so enabling the extension can change
  * which tied rows a pre-existing user query returns. Contract-
  * compatible, but if a query depends on one realized tie order, give
  * the window a total-order tie-break — or disable the rule with the
  * kill switch below.
  *
  * Injected by [[graft.GraftExtensions]]; disable with
  * `spark.graft.rewrite.windowTopK=false`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** True when a RankPrunePlan already sits under this window, possibly
    * below WindowGroupLimit nodes inserted by InferWindowGroupLimit. */
  private def alreadyPruned(p: LogicalPlan): Boolean = p match {
    case _: RankPrunePlan => true
    case wgl: WindowGroupLimit => alreadyPruned(wgl.child)
    case _ => false
  }

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
          if orderSpec.nonEmpty =>
        val rn = alias.toAttribute
        limitOf(cond, rn) match {
          case Some(k) if k > 0 && !projectList.exists(_.references.contains(rn)) &&
              projectList.forall(_.references.subsetOf(child.outputSet)) =>
            if (partitionSpec.nonEmpty) {
              Project(projectList, TopKPerKeyPlan(partitionSpec, orderSpec, k, child))
            } else {
              // global top-N: Limit(Sort) plans as TakeOrderedAndProject
              Project(projectList, Limit(Literal(k), Sort(orderSpec, global = true, child)))
            }
          case _ => p
        }

      // rank()/dense_rank() <= k: keep the window (exact ranks, ties and
      // all), prune provably-outside rows below it. Guard on the child
      // not already being pruned so the rule is idempotent across
      // optimizer iterations — looking through any WindowGroupLimit the
      // builtin InferWindowGroupLimit batch may have inserted between
      // the Window and an existing RankPrunePlan.
      case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(WindowExpression(_: Rank | _: DenseRank, _), _)),
            _, orderSpec, child, _))
          if orderSpec.nonEmpty && !alreadyPruned(child) =>
        limitOf(cond, alias.toAttribute) match {
          case Some(k) if k > 0 =>
            f.copy(child = w.copy(child =
              RankPrunePlan(w.partitionSpec, orderSpec, k, child)))
          case _ => f
        }
    }
  }
}

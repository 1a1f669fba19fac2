package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.plans.{MinHashSignature, ShingleHashes, SimHash64, SrpSignature, VectorDot}

/** Session-extension installer (the `SparkSessionExtensions` integration
  * point, SURVEY.md §7.3(c)): makes the engine's native functions
  * available in ANY session via configuration, no code changes —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * The same builders back [[GraftSql.registerFunctions]] (per-session
  * registration); this class is the cluster-deployment path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => GraftStrategies.TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

/** Physical strategies for graft's custom logical plans (§7.3(c)). */
object GraftStrategies {
  import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
  import graft.plans.{RankPruneExec, RankPrunePlan, TopKPerKeyExec, TopKPerKeyPartialExec, TopKPerKeyPlan}

  /** Lowers [[TopKPerKeyPlan]] to partial (map-side, pre-exchange) +
    * final (clustered) bounded-heap execs — the partial/final split
    * aggregation uses, applied to top-k — and [[RankPrunePlan]] to its
    * streaming map-side filter. */
  object TopKPerKeyStrategy extends SparkStrategy {
    override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[SparkPlan] =
      plan match {
        case TopKPerKeyPlan(keys, order, k, child) =>
          TopKPerKeyExec(keys, order, k,
            TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
        case RankPrunePlan(keys, order, k, child) =>
          RankPruneExec(keys, order, k, planLater(child)) :: Nil
        case _ => Nil
      }
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every native function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vector_dot",
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vector_dot(a, b)")
        VectorDot(exprs.head, exprs(1))
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_signature(hashes, k)")
        MinHashSignature(exprs.head, intLit(exprs(1), "minhash_signature k"))
      }),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "shingle_hashes(token_hashes, n)")
        ShingleHashes(exprs.head, intLit(exprs(1), "shingle_hashes n"))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64(token_hashes)")
        SimHash64(exprs.head)
      }),
    ("srp_signature",
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "srp_signature(emb, bits, seed)")
        SrpSignature(exprs.head, intLit(exprs(1), "srp_signature bits"),
          intLit(exprs(2), "srp_signature seed").toLong)
      }),
  )
}

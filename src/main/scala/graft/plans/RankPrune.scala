package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Tie-safe map-side prune below a rank()/dense_rank() top-N window.
  *
  * `rank() <= k` admits ties, so [[TopKPerKeyPlan]]'s exactly-k heap is
  * the WRONG operator (it would drop tied rows). This node instead
  * passes a row iff its order key is among (≤) the k smallest DISTINCT
  * order keys seen so far in this partition for its group — a streaming
  * filter with O(keys × k) state and zero row buffering. Soundness: a
  * row is rejected only when > k distinct smaller keys precede it in
  * this partition, which lower-bounds its partition-local dense_rank,
  * which lower-bounds its global dense_rank, which lower-bounds rank —
  * so every rejected row has final rank > k AND dense_rank > k. The
  * Window above recomputes exact ranks over the survivors, so results
  * are bit-identical to the unpruned plan; only sort/shuffle volume
  * changes (n rows → ~maps × keys × k + tie overshoot).
  *
  * Degradation: past `spark.graft.rankPrune.maxKeyBytes` of tracked
  * state, NEW groups pass through unpruned (existing groups keep
  * filtering) — pruning is an optimization per row, so this is always
  * safe. */
case class RankPrunePlan(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "rankPrune requires k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class RankPruneExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val kk = k
    val childOutput = child.output
    val maxBytes = conf.getConfString(RankPruneExec.MAX_KEY_BYTES_KEY,
      RankPruneExec.MAX_KEY_BYTES_DEFAULT.toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(
        BindReferences.bindReferences(keyExprs, childOutput))
      // project the order columns out of the row, then order the
      // projection with the SortOrder directions rebased onto it — the
      // TreeSet then IS "distinct by order key, smallest first"
      val ordProj = UnsafeProjection.create(
        BindReferences.bindReferences(orderExprs.map(_.child), childOutput))
      val rebased = orderExprs.zipWithIndex.map { case (so, i) =>
        so.copy(child = BoundReference(i, so.child.dataType, so.child.nullable))
      }
      val ordering: Ordering[InternalRow] = GenerateOrdering.generate(rebased)

      val state = new java.util.HashMap[UnsafeRow, java.util.TreeSet[UnsafeRow]]()
      var trackedBytes = 0L
      iter.filter { row =>
        val key = keyProj(row)
        var set = state.get(key)
        if (set == null && trackedBytes < maxBytes) {
          set = new java.util.TreeSet[UnsafeRow](ordering)
          val keyCopy = key.copy()
          state.put(keyCopy, set)
          trackedBytes += keyCopy.getSizeInBytes
        }
        if (set == null) true // over budget: new groups pass unpruned
        else {
          val ord = ordProj(row)
          // pass iff < k distinct keys tracked, or key ≤ current k-th
          // smallest (non-strict: a tie with the k-th can share rank k)
          val pass = set.size < kk || ordering.compare(ord, set.last) <= 0
          if (pass && !set.contains(ord)) {
            val copy = ord.copy()
            set.add(copy)
            trackedBytes += copy.getSizeInBytes
            if (set.size > kk) trackedBytes -= set.pollLast().getSizeInBytes
          }
          pass
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object RankPruneExec {
  /** Tracked-state budget; beyond it, new groups pass through unpruned
    * (pruning is optional per row, so degradation is always sound). */
  val MAX_KEY_BYTES_KEY = "spark.graft.rankPrune.maxKeyBytes"
  val MAX_KEY_BYTES_DEFAULT: Long = 64L * 1024 * 1024
}

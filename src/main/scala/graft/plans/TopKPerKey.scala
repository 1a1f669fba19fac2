package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §7.3(c)): top-k rows per key.
  *
  * The declarative formulation — `row_number().over(Window.partitionBy
  * (key).orderBy(ord)) <= k` — must SORT every key group in full before
  * discarding all but k rows; at 100 TB that is a full shuffle + full
  * sort of the fact table for a k-row-per-key answer. This operator
  * keeps a bounded k-row heap per key instead, in two phases mirroring
  * partial/final aggregation:
  *
  *  - [[TopKPerKeyPartialExec]] runs map-side (no distribution
  *    requirement): each input partition reduces to ≤ k rows per key it
  *    contains, so the exchange moves at most `maps × keys × k` rows —
  *    independent of input row count;
  *  - [[TopKPerKeyExec]] requires `ClusteredDistribution(keys)` (the
  *    planner inserts the exchange) and reduces each key to its final k
  *    rows, emitted in sort order per key.
  *
  * Registered via [[graft.GraftExtensions]] (`injectPlannerStrategy`);
  * built from the public API by [[org.apache.spark.sql.graft.relations
  * .topKPerKey]]. Semantics — including the total-order tie-break
  * requirement for determinism — match the window formulation row for
  * row (TopKSpec asserts equality).
  *
  * Memory safety without spill: a phase's heaps hold ≤ min(partition
  * rows, distinct-keys-in-partition × k) row copies — never more than
  * the partition's own data, and after the partial phase a partition is
  * already reduced to ≤ keys × k rows. The window formulation's sort
  * has the same footprint WITHOUT the reduction, so this operator is
  * strictly smaller-state. */
case class TopKPerKeyPlan(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "topKPerKey requires k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Per-partition bounded-heap reduction shared by both phases: a
  * max-heap (reverse ordering) per key whose head is the WORST retained
  * row, evicted whenever a better row arrives — O(rows · log k) time,
  * O(keys · k) memory, no sort of the input. */
abstract class TopKPerKeyBaseExec extends UnaryExecNode {
  def keys: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int
  def emitSorted: Boolean

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = order
    val kk = k
    val sorted = emitSorted
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(
        BindReferences.bindReferences(keyExprs, childOutput))
      val ordering: Ordering[InternalRow] = GenerateOrdering.generate(
        BindReferences.bindReferences(sortExprs, childOutput))
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          heap.add(row.copy())
        } else if (ordering.lt(row, heap.peek())) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.forEach { (_, heap) =>
        if (sorted) {
          val rows = new Array[InternalRow](heap.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
          buf ++= rows
        } else {
          val it = heap.iterator()
          while (it.hasNext) buf += it.next()
        }
      }
      buf.iterator
    }
  }
}

/** Map-side phase: no distribution requirement, ≤ k rows per key per
  * input partition survive to the exchange. */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends TopKPerKeyBaseExec {
  override def emitSorted: Boolean = false
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Final phase: clustered on the keys (planner inserts the shuffle),
  * emits each key's k rows in sort order. */
case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends TopKPerKeyBaseExec {
  override def emitSorted: Boolean = true
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

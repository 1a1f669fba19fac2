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
  * Memory safety: the map-side heaps hold ≤ min(partition rows,
  * distinct-keys-in-partition × k) row copies — when key cardinality
  * approaches row count, that is the whole partition materialized as
  * JVM copies, and unlike the window formulation's sort this state is
  * NOT spillable. The partial phase therefore flushes: past a byte
  * budget (`spark.graft.topk.partialFlushBytes`, default 64 MiB) it
  * emits every heap's current rows and starts fresh. This is correct
  * for the same reason Spark's partial aggregation may emit partial
  * buffers early — the final phase re-reduces whatever reaches it; a
  * flush only weakens the map-side reduction (more exchange rows),
  * never the answer. The FINAL phase never flushes (it must see a
  * key's rows together); its retained state is ≤ its own output
  * (keys-in-partition × k rows), the result it must produce anyway.
  * If a workload still can't afford that, the kill switch
  * `spark.graft.rewrite.windowTopK=false` restores Spark's spillable
  * window sort (see SCALE.md). */
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
  * O(keys · k) memory, no sort of the input. The partial phase bounds
  * that memory further by flushing all heaps once retained bytes exceed
  * [[TopKPerKeyBaseExec.FLUSH_BYTES_KEY]] (a flushed batch is a valid
  * partial reduction — the final phase re-reduces). */
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
    // only the partial phase may flush early; the final phase must hold a
    // key's full candidate set to produce the true top k
    val flushBytes: Long =
      if (emitSorted) Long.MaxValue
      else conf.getConfString(TopKPerKeyBaseExec.FLUSH_BYTES_KEY,
        TopKPerKeyBaseExec.FLUSH_BYTES_DEFAULT.toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(
        BindReferences.bindReferences(keyExprs, childOutput))
      val ordering: Ordering[InternalRow] = GenerateOrdering.generate(
        BindReferences.bindReferences(sortExprs, childOutput))

      new Iterator[InternalRow] {
        private var heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var retainedBytes = 0L
        private var drained: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false

        private def rowBytes(r: InternalRow): Long = r match {
          case u: UnsafeRow => u.getSizeInBytes.toLong
          case _ => 64L // conservative estimate for non-unsafe rows
        }

        /** Emit every heap's rows and reset state. */
        private def drainHeaps(): Iterator[InternalRow] = {
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
          heaps = new java.util.HashMap()
          retainedBytes = 0L
          buf.iterator
        }

        private def advance(): Unit = {
          while (!drained.hasNext && !inputDone) {
            var flush = false
            while (!flush && iter.hasNext) {
              val row = iter.next()
              val key = keyProj(row)
              var heap = heaps.get(key)
              if (heap == null) {
                heap = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reverse)
                val keyCopy = key.copy()
                heaps.put(keyCopy, heap)
                retainedBytes += keyCopy.getSizeInBytes
              }
              if (heap.size < kk) {
                val copy = row.copy()
                heap.add(copy)
                retainedBytes += rowBytes(copy)
              } else if (ordering.lt(row, heap.peek())) {
                retainedBytes -= rowBytes(heap.poll())
                val copy = row.copy()
                heap.add(copy)
                retainedBytes += rowBytes(copy)
              }
              if (retainedBytes > flushBytes) flush = true
            }
            if (!iter.hasNext) inputDone = true
            drained = drainHeaps()
          }
        }

        override def hasNext: Boolean = { advance(); drained.hasNext }
        override def next(): InternalRow = { advance(); drained.next() }
      }
    }
  }
}

object TopKPerKeyBaseExec {
  /** Partial-phase flush budget: retained heap bytes before the map-side
    * state is emitted as a partial reduction and reset. */
  val FLUSH_BYTES_KEY = "spark.graft.topk.partialFlushBytes"
  val FLUSH_BYTES_DEFAULT: Long = 64L * 1024 * 1024
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

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` backend-agnostic
  * (Spark Connect) and gated the classic Expression conversions behind
  * `private[sql]`; extension libraries that ship custom Catalyst
  * expressions need this two-line bridge in the sql package — the same
  * pattern every public Spark extension uses for 4.x.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage blocks behind an eager `localCheckpoint`ed
    * frame (round-13 ADVICE: memo EVICTION dropped the reference but the
    * blocks waited on GC + ContextCleaner — explicit unpersist frees
    * them deterministically). A checkpointed Dataset's plan is a flat
    * `LogicalRDD` over the materialized RDD; unpersisting that RDD drops
    * its MEMORY_AND_DISK blocks. No-op for non-checkpointed frames. */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

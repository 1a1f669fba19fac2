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
}

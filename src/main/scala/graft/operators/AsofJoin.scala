package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with the same key and rightTs ≤ leftTs. The operator Spark
  * lacks natively (SURVEY.md §7.3 "as-of join → union+window trick").
  *
  * Implementation is the union+window formulation, chosen over a range
  * join for scale: both sides are tagged and unioned, shuffled ONCE by
  * key, sorted within each key partition by (time, side, tie-break), and
  * the right payload is carried forward with `last(_, ignoreNulls)` over
  * an unbounded-preceding frame. Cost is one shuffle + one sort —
  * exactly a sort-merge join's shape — versus the quadratic blowup of a
  * non-equi range join (BroadcastNestedLoop) on dense keys.
  *
  * Determinism: right rows sort before left rows at equal timestamps
  * (inclusive match), and `tieBreak` orders equal-timestamp right rows;
  * the caller should either provide a unique tie-break or project only
  * columns that are functionally determined by (key, rightTs).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, leftTs: String, leftKey: String,
      right: DataFrame, rightTs: String, rightKey: String,
      payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {

    val leftCols = left.columns.toSeq
    val sideL = left
      .withColumn("__graft_k", col(leftKey))
      .withColumn("__graft_t", col(leftTs))
      .withColumn("__graft_side", lit(1))
    // right side: null out the left schema, carry payload under _p_ names
    val sideR0 = right.select(
      (col(rightKey).as("__graft_k") +: col(rightTs).as("__graft_t") +: lit(0).as("__graft_side") +:
        payload.map(c => col(c).as(s"__graft_p_$c")) ++:
        tieBreak.map(c => col(c).as(s"__graft_tb_$c"))): _*)
    val withNullPayloadL = payload.foldLeft(sideL) { (df, c) =>
      df.withColumn(s"__graft_p_$c", lit(null).cast(right.schema(c).dataType))
    }
    val withTbL = tieBreak.foldLeft(withNullPayloadL) { (df, c) =>
      df.withColumn(s"__graft_tb_$c", lit(null).cast(right.schema(c).dataType))
    }
    val withNullLeftR = leftCols.foldLeft(sideR0) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = withTbL.unionByName(withNullLeftR.select(withTbL.columns.map(col): _*))

    val order: Seq[Column] =
      col("__graft_t") +: col("__graft_side") +: tieBreak.map(c => col(s"__graft_tb_$c"))
    val w = Window.partitionBy(col("__graft_k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__graft_m_$c", last(col(s"__graft_p_$c"), ignoreNulls = true).over(w))
    }
    // inner as-of semantics: left rows with no preceding right row drop
    filled
      .filter(col("__graft_side") === 1 && col(s"__graft_m_${payload.head}").isNotNull)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__graft_m_$c").as(s"asof_$c")): _*)
  }
}

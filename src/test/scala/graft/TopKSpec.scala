package graft

import org.apache.spark.sql.functions._

/** The custom top-k-per-key operator stack (logical node → strategy →
  * partial/final heap execs) must be row-identical to the window
  * formulation and must plan WITHOUT a Window or per-group full Sort.
  */
class TopKSpec extends SparkSpec {

  private def viaCustom = org.apache.spark.sql.graft.relations.topKPerKey(
    Tables.orders(spark, sf),
    keys = Seq("o_orderstatus", "o_orderpriority"),
    sort = Seq(("o_totalprice", false), ("o_orderkey", true)),
    k = 3)

  private def viaWindow = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
  }

  test("custom top-k equals the row_number window formulation") {
    val a = viaCustom.collect().map(_.toString).sorted.toSeq
    val b = viaWindow.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("plans heap execs with a partial phase below the exchange, no Window") {
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(!plan.contains("Window"), "custom operator fell back to a window:\n" + plan)
    // partial must sit below the exchange (map-side reduction)
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("TopKPerKeyPartial")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "partial phase is not below the exchange:\n" + plan)
  }

  test("per-key row bound holds and rows are the true maxima") {
    val rows = viaCustom
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("worst_kept"))
    val maxN = rows.agg(max(col("n"))).head().getLong(0)
    assert(maxN <= 3)
    // every kept row must beat the best dropped row per group
    val kept = viaCustom.select(col("o_orderstatus"), col("o_orderpriority"),
      col("o_orderkey").as("kept_key"), col("o_totalprice").as("kept_price"))
    val all = Tables.orders(spark, sf)
    val dropped = all.join(kept.select(col("kept_key")),
      all("o_orderkey") === col("kept_key"), "left_anti")
    val bestDropped = dropped.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(max(col("o_totalprice")).as("best_dropped"))
    val violations = kept.join(bestDropped, Seq("o_orderstatus", "o_orderpriority"))
      .filter(col("kept_price") < col("best_dropped"))
      .count()
    assert(violations == 0)
  }

  test("partial-phase flush-on-budget keeps results exact") {
    // a 1 KiB budget forces many mid-partition flushes (each a valid
    // partial reduction the final phase re-reduces) — the answer must
    // not change, only the exchange volume
    spark.conf.set(graft.plans.TopKPerKeyBaseExec.FLUSH_BYTES_KEY, "1024")
    try {
      val a = viaCustom.collect().map(_.toString).sorted.toSeq
      val b = viaWindow.collect().map(_.toString).sorted.toSeq
      assert(a == b)
      assert(a.nonEmpty)
    } finally spark.conf.unset(graft.plans.TopKPerKeyBaseExec.FLUSH_BYTES_KEY)
  }

  test("topKPerKey rejects ambiguous (duplicate) column names") {
    val o = Tables.orders(spark, sf)
    val dup = o.select(col("o_orderkey"), col("o_totalprice"))
      .crossJoin(o.select(col("o_totalprice")).limit(1))
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.relations.topKPerKey(
        dup, Seq("o_orderkey"), Seq(("o_totalprice", false)), 1)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("empty input yields empty output") {
    val empty = Tables.orders(spark, sf).filter(col("o_orderkey") < 0)
    val out = org.apache.spark.sql.graft.relations.topKPerKey(
      empty, Seq("o_orderstatus"), Seq(("o_totalprice", false)), 2)
    assert(out.count() == 0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite (window top-N idiom → bounded-heap operator)
  * in an extensions-enabled session: users write the standard
  * row_number pattern, the plan comes back heap-shaped, and results are
  * identical to the un-rewritten session's.
  */
class WindowTopKRewriteSpec extends AnyFunSuite {

  private lazy val extSpark: SparkSession = {
    // getOrCreate() returns any existing default session, silently
    // dropping withExtensions — force the shared suite session into
    // existence first, then build a sibling session (same SparkContext,
    // own sessionState+extensions) with the defaults cleared, and
    // restore so other suites are untouched.
    val base = SparkSpec.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosFlag, "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def windowTopN(s: SparkSession) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, SparkSpec.Sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_orderkey"), col("o_totalprice"))
  }

  test("standard window top-N rewrites to the heap operator, same rows") {
    val df = windowTopN(extSpark)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerKey"), "rewrite did not fire:\n" + optimized)
    assert(!optimized.contains("Window"), "window survived the rewrite:\n" + optimized)
    val rewritten = df.collect().map(_.toString).sorted.toSeq
    val plain = windowTopN(SparkSpec.spark).collect().map(_.toString).sorted.toSeq
    assert(rewritten == plain)
    assert(rewritten.nonEmpty)
  }

  test("global (empty partitionBy) top-N rewrites to sort+limit, same rows") {
    def globalTopN(s: SparkSession) = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, SparkSpec.Sf)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 7)
        .select(col("o_orderkey"), col("o_totalprice"))
    }
    val df = globalTopN(extSpark)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window"), "window survived the rewrite:\n" + optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      "global top-N did not plan TakeOrderedAndProject:\n" + physical)
    val rewritten = df.collect().map(_.toString).sorted.toSeq
    val plain = globalTopN(SparkSpec.spark).collect().map(_.toString).sorted.toSeq
    assert(rewritten == plain)
    assert(rewritten.size == 7)
  }

  test("rewrite declines when the rank column is kept in the output") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(extSpark, SparkSpec.Sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_orderkey"), col("rn")) // rank survives → must keep Window
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Window"), optimized)
    assert(!optimized.contains("TopKPerKey"), optimized)
  }

  test("rank() top-N keeps its Window but gains the tie-safe prune (no heap)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc)
    val df = Tables.orders(extSpark, SparkSpec.Sf)
      .withColumn("rn", rank().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_orderkey"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("TopKPerKey"), optimized)
    assert(optimized.contains("Window"), optimized)
    assert(optimized.contains("RankPrune"), "prune did not fire:\n" + optimized)
  }

  // rank()/dense_rank() with a DELIBERATELY tie-heavy order key (price
  // bucketed to 50k) — the case the heap operator must not touch and the
  // prune must not change: tied rows beyond position k still belong in
  // the output.
  private def rankTopN(s: SparkSession, dense: Boolean) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("bucket").desc)
    Tables.orders(s, SparkSpec.Sf)
      .withColumn("bucket", floor(col("o_totalprice") / 50000.0))
      .withColumn("rn", (if (dense) dense_rank() else rank()).over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("o_orderkey"), col("bucket"), col("rn"))
  }

  test("rank() with ties: pruned plan returns row-identical results") {
    for (dense <- Seq(false, true)) {
      val df = rankTopN(extSpark, dense)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("RankPrune"), "prune did not fire:\n" + optimized)
      val pruned = df.collect().map(_.toString).sorted.toSeq
      val plain = rankTopN(SparkSpec.spark, dense).collect().map(_.toString).sorted.toSeq
      assert(pruned == plain, s"dense=$dense: pruned results differ")
      assert(pruned.nonEmpty)
      // ties are real in this fixture: more rows than 3 per group
      val perGroup = rankTopN(SparkSpec.spark, dense)
        .groupBy("o_orderstatus").count().collect().map(_.getLong(1))
      assert(perGroup.exists(_ > 3), "fixture has no ties — test is vacuous")
    }
  }

  test("rank prune degrades soundly when the state budget is exhausted") {
    // with a 1-byte budget no group can be tracked — every row passes
    // through unpruned and the window must still produce exact results
    extSpark.conf.set(graft.plans.RankPruneExec.MAX_KEY_BYTES_KEY, "1")
    try {
      val df = rankTopN(extSpark, dense = false)
      assert(df.queryExecution.optimizedPlan.toString.contains("RankPrune"))
      val got = df.collect().map(_.toString).sorted.toSeq
      val plain = rankTopN(SparkSpec.spark, dense = false).collect().map(_.toString).sorted.toSeq
      assert(got == plain, "budget-degraded prune changed results")
    } finally extSpark.conf.unset(graft.plans.RankPruneExec.MAX_KEY_BYTES_KEY)
  }

  test("kill switch: spark.graft.rewrite.windowTopK=false keeps the window") {
    extSpark.conf.set("spark.graft.rewrite.windowTopK", "false")
    try {
      val optimized = windowTopN(extSpark).queryExecution.optimizedPlan.toString
      assert(optimized.contains("Window") && !optimized.contains("TopKPerKey"), optimized)
    } finally extSpark.conf.unset("spark.graft.rewrite.windowTopK")
  }
}

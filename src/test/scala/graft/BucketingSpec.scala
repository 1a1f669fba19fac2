package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle a 100 TB pipeline amortizes: write each
  * join side hash-bucketed (and sorted) by its key once, and every
  * subsequent equi-join on that key co-locates by bucket file — no
  * Exchange on either side, and with sortBy no per-task Sort either.
  * This suite proves the engine produces that plan: the bucketed join
  * must contain ZERO shuffle exchanges and return exactly the plain
  * join's rows. (Spark public API: `DataFrameWriter.bucketBy/sortBy` +
  * bucket-aware scan; the same layout discipline the reference's
  * sharded workers get from their ring-buffer partitioning, here made
  * persistent across queries.)
  */
class BucketingSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case e: ShuffleExchangeExec => e }

  test("bucketed equi-join co-locates: zero shuffles, rows identical to plain join") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps subtrees in opaque query stages `collect` won't traverse;
    // the static plan is what this suite asserts (PlanShapeSpec pattern)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_orders_bucketed")
      Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_customer_bucketed")

      val bucketed = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tp"))

      val p = executed(bucketed)
      // the join itself must read bucket files directly: the ONLY
      // acceptable exchange is the one for the groupBy ON A DIFFERENT
      // key — and even that one is downstream of the join, so assert
      // zero shuffles BELOW the join node
      val joinNode = p.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joinNode.isDefined, s"no shuffle-family join found:\n$p")
      assert(shuffles(joinNode.get).isEmpty,
        s"bucketed join still shuffles an input:\n$p")

      // correctness: identical to the un-bucketed formulation
      val plain = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tp"))
      val got = bucketed.orderBy("c_mktsegment").collect().map(r =>
        (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      val want = plain.orderBy("c_mktsegment").collect().map(r =>
        (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      assert(got.sameElements(want))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
    }
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket's files") {
    try {
      spark.range(0, 10000)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
        .write.mode("overwrite")
        .bucketBy(16, "k")
        .saveAsTable("graft_pruned_bucketed")
      val q = spark.table("graft_pruned_bucketed").filter(col("k") === 4242L)
      val scan = executed(q).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.isDefined)
      // optionalBucketSet pruned to exactly one of 16 buckets
      val pruned = scan.get.optionalBucketSet
      assert(pruned.isDefined, "no bucket pruning applied:\n" + scan.get)
      assert(pruned.get.cardinality() == 1,
        s"expected 1 surviving bucket, got ${pruned.get.cardinality()}")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(4242L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_pruned_bucketed")
  }
}

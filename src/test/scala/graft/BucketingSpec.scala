package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled on-disk layout so repeated joins/aggs on the
  * bucket key skip the exchange entirely — the 100 TB answer to "this
  * join runs every hour on the same key". */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // warehouse dir is a tmp dir set statically in SparkSpec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      o.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      c.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it's still correct
      val expected = o.join(c, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}

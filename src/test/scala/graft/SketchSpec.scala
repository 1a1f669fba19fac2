package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Approximate-distinct (HLL++) error bound vs exact counts. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Relational.q33ApproxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$k orders: $ao vs $o")
    }
  }
}

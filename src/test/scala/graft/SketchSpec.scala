package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Approximate-distinct (HLL++) error bound vs exact counts. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("p"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("o"))
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

  test("q33 oracle shape: exact counts + within-bound flags all true") {
    val rows = Relational.q33ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)} parts estimate outside 6% bound")
      assert(r.getBoolean(5), s"${r.getString(0)} orders estimate outside 6% bound")
    }
  }
}

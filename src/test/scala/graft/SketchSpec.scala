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

  test("q75 exact-mode ceiling: distinct users stay under theta nominal entries at every verified SF") {
    // q75's hash-exact oracle match depends on the sketches operating in
    // EXACT mode: lgNomEntries=12 -> 4096 nominal entries must exceed
    // the distinct user count (any union of per-type sketches is bounded
    // by the global distinct count). If a new SF breaks this, raise
    // lgNomEntries in q75 AND this guard together (round-3 ADVICE).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val n = Tables.events(spark, dir)
        .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
      assert(n < 4096,
        s"$dir: $n distinct users >= 4096 nominal entries - q75 sketches leave exact mode")
    }
  }

  test("q79 sketch assumptions hold at every verified SF: exact mode + tie-safe overfetch") {
    // q79's sketch_agrees flag needs (a) maxItemsTracked=100000 above the
    // distinct part-key count (exact counting) and (b) no more than 50
    // keys tied at the exact top-10 boundary count (so the k=50 sketch
    // must contain every exact-top-10 item regardless of its internal
    // tie order). Pin both per SF, like q75's exact-mode ceiling.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val counts = Tables.lineitem(spark, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      val distinct = counts.count()
      assert(distinct < 100000L,
        s"$dir: $distinct part keys >= maxItemsTracked - q79 sketch leaves exact mode")
      val boundary = counts.orderBy(col("n").desc, col("l_partkey"))
        .limit(10).agg(min(col("n"))).collect().head.getLong(0)
      val tied = counts.filter(col("n") >= boundary).count()
      assert(tied <= 50L,
        s"$dir: $tied keys at/above the top-10 boundary count > sketch k=50 - flag not tie-safe")
    }
  }

  test("q70/q78 session-boundary assumption holds at every verified SF: no exact 10-minute gaps") {
    // Spark's session_window closes a session at gap >= gapDuration; the
    // DuckDB oracle's lag-CTE closes at gap > gapDuration. The hash match
    // relies on NO consecutive same-user event gap being EXACTLY 10
    // minutes (measure-zero on microsecond timestamps, but a regenerated
    // fixture with whole-minute timestamps would silently flip the
    // driver gate — round-4 ADVICE). Pin it per SF so fixture drift
    // fails loudly here instead.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
      val exactBoundary = Tables.events(spark, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap") === 600000000L)
        .count()
      assert(exactBoundary == 0L,
        s"$dir: $exactBoundary exact 10-minute gaps - q70/q78 >= vs > boundary semantics now diverge")
    }
  }
}

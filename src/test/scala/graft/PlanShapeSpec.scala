package graft

import graft.operators.{Relational, Similarity}

/** Physical-plan assertions — the scale contract, checked in CI: filters
  * and projections reach the parquet scan, dimension joins broadcast,
  * global top-k avoids a total sort, and the native expressions stay
  * inside whole-stage codegen. A regression here is a 100 TB performance
  * bug even when results stay correct.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filter and projection are pushed to the parquet scan") {
    val p = plan(Relational.q02FilterProject(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(!p.contains("l_returnflag"), "scan reads unprojected column")
  }

  test("q04: all three dimension joins are broadcast (fact side never shuffles for joins)") {
    val p = plan(Relational.q04MultiJoinRegion(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q05/q06: semi and anti joins plan as broadcast hash joins") {
    assert(plan(Relational.q05SemiJoin(spark, sf)).contains("LeftSemi"))
    assert(plan(Relational.q06AntiJoin(spark, sf)).contains("LeftAnti"))
  }

  test("q10: global top-k plans TakeOrderedAndProject, not a total sort") {
    val p = plan(Relational.q10TopKOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01: aggregation is partial (map-side) then final") {
    val p = plan(Relational.q01PricingSummary(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation: " + p)
  }

  test("s01: native vector_dot runs inside whole-stage codegen") {
    // AQE wraps the plan until execution; disable it so WholeStageCodegen
    // nodes are visible in the static physical plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Similarity.s01CosineTopK(spark, sf)
      val exec = df.queryExecution.executedPlan
      assert(exec.toString.contains("vector_dot"), exec.toString)
      val codegenContainsDot = exec.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("vector_dot") => w
      }
      assert(codegenContainsDot.nonEmpty, "vector_dot fell out of codegen")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** `Dataset.observe` — the zero-cost pipeline observability primitive:
  * named aggregates computed DURING a query's normal execution (inside
  * the same pass, no second scan, no caching) and published to the
  * driver when the action completes. This is how a production run of
  * any graft query exports row counts / quality tallies / drop rates
  * without re-reading 100 TB: attach observe() to the stage, read the
  * metrics after the sink action. */
class ObserveSpec extends SparkSpec {

  test("observed metrics match a direct aggregation, computed in the same pass") {
    val obs = Observation("lineitem-stats")
    val li = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(col("l_quantity")).as("qty"),
        count(when(col("l_returnflag") === "R", 1)).as("returned"))
    // the observing query does unrelated work; metrics ride along
    val kept = li.filter(col("l_discount") > 0.02).count()
    val m = obs.get
    val direct = Tables.lineitem(spark, sf)
      .agg(count(lit(1)), sum(col("l_quantity")),
        count(when(col("l_returnflag") === "R", 1)))
      .head()
    assert(m("rows") == direct.getLong(0))
    assert(m("qty") == direct.getDouble(1))
    assert(m("returned") == direct.getLong(2))
    assert(kept > 0 && kept <= m("rows").asInstanceOf[Long])
  }

  test("observe rides an existing registered query without changing its result") {
    val obs = Observation("q01-input")
    // wrap the table the same way q01 reads it, observe input volume
    val observed = Tables.lineitem(spark, sf).observe(obs, count(lit(1)).as("n_in"))
    observed.createOrReplaceTempView("graft_observe_probe")
    val n = observed.groupBy(col("l_returnflag")).count().collect().map(_.getLong(1)).sum
    assert(obs.get("n_in") == n)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md §2). All queries take an `sfDir` so the same code runs at
  * any scale factor — and, on a real cluster, against any parquet root.
  *
  * Reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the scan; never pre-collect.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Generic loader; routes `events` through its nanos-aware reader. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** Config every graft session must carry at CONSTRUCTION time: the
    * events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright, so it is read as a raw long.
    * Setting this inside `events()` would be a hidden global side effect
    * (it changes nanos handling for every later parquet read in the
    * session) — all graft builders (Verify/Bench/Plans/ScaleSmoke and the
    * test harness) pass it explicitly instead. */
  val nanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Rebuild a proper TimestampType column from the nanos-as-long read
    * via FLOOR division to micros — `pmod` keeps the remainder
    * non-negative, so pre-epoch (negative) nanos round toward -∞ exactly
    * like DuckDB's ns→us conversion; plain `div` would truncate toward
    * zero and diverge on pre-1970 timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption(nanosFlag).contains("true"),
      s"events.parquet is TIMESTAMP(NANOS): build the session with " +
        s".config(\"$nanosFlag\", \"true\") (see graft.Verify)")
    raw(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

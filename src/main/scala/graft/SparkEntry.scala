package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Graph, Multimodal, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator family's query map; each key
  * with an `oracleSql` entry is hash-compared against DuckDB by the
  * driver (CORRECTNESS gate), the rest get a rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04MultiJoinRegion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ Multimodal.oracleSql ++ Graph.oracleSql
}

package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the engine to `spark.sql(...)`.
  *
  *  - every test table becomes a temp view named as in TESTDATA.md;
  *  - the native expressions register as SQL functions, so
  *    `SELECT vector_dot(a.embedding, b.embedding) ...` and
  *    `SELECT minhash_signature(hashes, 128) ...` plan the same codegen
  *    operators as the DataFrame API (one engine, two frontends —
  *    mirrors how Spark itself layers SQL over Catalyst).
  */
object GraftSql {

  /** Register all tables under `dir` as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Register the engine's native functions in this session (shares the
    * builder definitions with [[GraftExtensions]], the config-driven
    * cluster-deployment path). */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  def register(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    registerFunctions(spark)
  }
}

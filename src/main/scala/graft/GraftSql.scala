package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.plans.{MinHashSignature, VectorDot}

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

  /** Register the engine's native functions in the session. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vector_dot",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vector_dot(a, b)")
        VectorDot(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_signature(hashes, k)")
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature k must be an integer literal, got $other")
        }
        MinHashSignature(exprs.head, k)
      }, "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "shingle_hashes(token_hashes, n)")
        val n = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes n must be an integer literal, got $other")
        }
        graft.plans.ShingleHashes(exprs.head, n)
      }, "built-in")
  }

  def register(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    registerFunctions(spark)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over ArrayType(FloatType) embedding columns.
  *
  * Composed from higher-order builtins (`zip_with` + `aggregate`) so the
  * arithmetic runs inside whole-stage codegen — no UDF boxing per element.
  * All sums are sequential left-to-right in DOUBLE, which matches DuckDB's
  * list_* kernels bit-for-bit (validated against the oracle), making
  * similarity values hash-stable across engines.
  */
object VectorFunctions {

  /** Elementwise cast to double (parquet embeddings are float32). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x))

  /** Cosine similarity with precomputed norms (for reuse across a join). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Cosine similarity of two float vectors. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    cosineWithNorms(ad, bd, l2Norm(ad), l2Norm(bd))
  }

  /** Squared L2 distance (for IVF centroid assignment — avoids the sqrt). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.plans.VectorDot

/** Dense-vector primitives over ArrayType(Float|Double) embedding columns,
  * backed by the native [[graft.plans.VectorDot]] codegen expression
  * (primitive double loop in whole-stage codegen; the higher-order
  * `aggregate(zip_with(...))` formulation it replaced is CodegenFallback
  * and ~300× slower per pair).
  *
  * All sums are sequential left-to-right in DOUBLE, which matches DuckDB's
  * list_* kernels bit-for-bit (validated against the oracle), making
  * similarity values hash-stable across engines.
  */
object VectorFunctions {

  /** Elementwise cast to double (parquet embeddings are float32). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential dot product in double (native codegen expression). */
  def dot(a: Column, b: Column): Column =
    bridge.column(VectorDot(bridge.expression(a), bridge.expression(b)))

  /** L2 norm = sqrt(a·a). */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with precomputed norms (for reuse across a join). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Cosine similarity of two vectors. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, l2Norm(a), l2Norm(b))

  /** Squared L2 distance (for IVF centroid assignment — avoids the
    * sqrt): |a|² - 2a·b + |b|² computed as dots. */
  def l2Sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
}

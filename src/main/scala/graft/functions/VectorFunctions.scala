package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.plans.{CentroidDistances, SrpSignature, VectorDot}

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

  /** Unit-normalize a vector (pre-normalizing a corpus turns cosine
    * top-k into dot-product top-k — one multiply-add per element at
    * query time instead of three). Zero vectors pass through unchanged.
    * The norm is broadcast to element positions via array_repeat — an
    * HoF ARGUMENT, evaluated once — rather than referenced inside the
    * lambda, which would recompute the full dot product per element
    * (O(d²) per row; see the TextFunctions performance contract). */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n > 0.0,
      zip_with(v, array_repeat(n, size(v)), (x, m) => (x / m).cast("float")))
      .otherwise(v)
  }

  /** SRP-LSH signature as `bits/64` longs (native single-node expression;
    * see [[graft.plans.SrpSignature]] for why not a when/dot composition). */
  def srpSig(v: Column, bits: Int = 128, seed: Long = 42L): Column =
    bridge.column(SrpSignature(bridge.expression(v), bits, seed))

  /** Squared L2 distance to each fixed centroid as array<double>
    * (native single-node expression; see [[graft.plans.CentroidDistances]]). */
  def centroidDists(v: Column, cents: Seq[Array[Double]]): Column =
    bridge.column(CentroidDistances(bridge.expression(v), cents.map(_.toSeq)))

  /** Scalar int8 quantization: clamp(round(x/scale), -127, 127) — the
    * standard 4× footprint cut for 100 TB embedding storage. */
  def quantizeInt8(v: Column, scale: Double): Column =
    transform(v, x => greatest(lit(-127), least(lit(127),
      round(x / scale, 0).cast("int"))).cast("byte"))

  /** Inverse of [[quantizeInt8]] (lossy). */
  def dequantizeInt8(v: Column, scale: Double): Column =
    transform(v, x => (x.cast("double") * scale).cast("float"))
}

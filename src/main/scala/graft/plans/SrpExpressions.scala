package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-random-projection signature (Charikar, STOC'02) as ONE native
  * expression.
  *
  * The compositional formulation — 128 × `when(vector_dot(emb, <64-double
  * literal>) > 0, 1L << b)` folded with bitwise OR — is semantically
  * identical but catastrophically slow to PLAN: the optimizer walks a
  * ~400-node tree carrying 128 array literals through every rule
  * iteration, and janino compiles the inlined loops once per plan branch.
  * On a 2 000-row × 64-dim corpus the old s03 spent 17–60 s almost
  * entirely on the driver. This expression is a single tree node; the
  * plane matrix lives in a reference object, built lazily per observed
  * dimension and cached.
  *
  * Bit layout matches the compositional version bit-for-bit: plane `b`
  * (global index) has component `d` = +1 iff `XXH64.hashLong(b*4099 + d,
  * seed) & 1 == 1` else −1; word `w = b >> 6` gets bit `b & 63` set iff
  * `emb · plane_b > 0.0` (strict), dots accumulated sequentially in
  * double. Output: array<long> of `bits/64` words.
  */
case class SrpSignature(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_signature expects array<float|double>, got $t")
    }

  @transient private lazy val elemIsFloat =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  // Planes flattened as [b * dim + d]; keyed by dim so the expression
  // needs no driver-side dimension probe. Thread-safe: worst case two
  // threads build the same deterministic array.
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  private def planes(dim: Int): Array[Double] =
    planeCache.computeIfAbsent(dim, { d =>
      val arr = new Array[Double](bits * d)
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < d) {
          arr(b * d + i) =
            if ((XXH64.hashLong((b.toLong * 4099) + i, seed) & 1L) == 1L) 1.0 else -1.0
          i += 1
        }
        b += 1
      }
      arr
    })

  /** Shared by interpreted eval and codegen (via reference object). */
  def evalSig(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val pl = planes(dim)
    val words = new Array[Long]((bits + 63) >> 6)
    var b = 0
    while (b < bits) {
      val off = b * dim
      var s = 0.0
      var d = 0
      while (d < dim) {
        val x = if (elemIsFloat) a.getFloat(d).toDouble else a.getDouble(d)
        s += x * pl(off + d)
        d += 1
      }
      if (s > 0.0) words(b >> 6) |= 1L << (b & 63)
      b += 1
    }
    new GenericArrayData(words)
  }

  override def nullSafeEval(input: Any): Any =
    evalSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpSig", this, classOf[SrpSignature].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.evalSig($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "srp_signature"
}

/** Squared-L2 distance from a vector to each of k fixed centroids, as
  * array<double> (index = cell id) — the IVF assignment/probing kernel.
  *
  * Replaces `array(l2Sq(emb, lit(c0)), …, l2Sq(emb, lit(ck)))`, which
  * expands to 3k `vector_dot` nodes dragging k array literals through
  * every optimizer rule (the dominant cost of s02 on small data — pure
  * driver planning time). Arithmetic is bit-identical to the
  * compositional form: per cell, `(a·a − 2·(a·c)) + (c·c)`, each dot a
  * sequential double sum; `c·c` is precomputed once per centroid exactly
  * as constant folding did.
  */
case class CentroidDistances(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_distances expects array<float|double>, got $t")
    }

  @transient private lazy val elemIsFloat =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  // c·c with the same sequential summation the folded literal dot used.
  @transient private lazy val centSq: Array[Double] =
    centArr.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  /** Shared by interpreted eval and codegen (via reference object). */
  def evalDists(a: ArrayData): ArrayData = {
    val k = centArr.length
    val out = new Array[Double](k)
    val n = a.numElements()
    // a·a once per row (identical value to the per-cell re-evaluation the
    // compositional form implied; CSE made that a single eval too).
    var aa = 0.0
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      aa += x * x
      i += 1
    }
    var c = 0
    while (c < k) {
      val cent = centArr(c)
      // a silent min(n, cent.length) truncation here would return wrong
      // distances on dimension mismatch — fail loudly like VectorDot does
      if (n != cent.length) {
        throw new IllegalArgumentException(
          s"centroid_distances: input dimension $n != centroid dimension ${cent.length}")
      }
      var ac = 0.0
      var d = 0
      while (d < n) {
        val x = if (elemIsFloat) a.getFloat(d).toDouble else a.getDouble(d)
        ac += x * cent(d)
        d += 1
      }
      out(c) = aa - 2.0 * ac + centSq(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalDists(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centDists", this, classOf[CentroidDistances].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.evalDists($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "centroid_distances"
}

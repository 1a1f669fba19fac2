package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: slot j = min over shingle hashes h of
  * xxhash64(h, j), bit-identical to the builtin-composed formulation
  * `transform(sequence(0,k-1), j -> array_min(transform(hs, h ->
  * xxhash64(h, j))))` it replaces (xxhash64(a,b) = hashLong(b,
  * hashLong(a, 42)); the inner hash is hoisted per shingle since it
  * doesn't depend on j).
  *
  * Why native (SURVEY.md §7.3): the HoF version is interpreted
  * (CodegenFallback) and allocates per lambda call — k×|shingles| boxed
  * evals per row made MinHash-LSH the slowest operator at sf0.1 (16 s
  * for 5000 docs). This is a primitive long loop in whole-stage codegen.
  * Empty inputs yield an all-MaxValue signature (never collides).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val base = XXH64.hashLong(hs.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(j.toLong, base)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      s"""
         |final int $m = $hs.numElements();
         |final long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $m; $i++) {
         |  final long $base = $xxh.hashLong($hs.getLong($i), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = $xxh.hashLong((long) $j, $base);
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

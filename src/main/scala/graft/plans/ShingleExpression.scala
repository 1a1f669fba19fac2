package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native n-gram shingle hashing over a token-hash array: output i is
  * the XXH64 chain over (h_i, ..., h_{i+n-1}), i.e. the same combinator
  * Spark's variadic xxhash64 uses. Replaces the interpreted
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i+1, n)))`
  * + string-xxhash64 pipeline: no string materialization, no per-window
  * allocation — one primitive loop in whole-stage codegen. Any
  * consistent content hash works for Jaccard/MinHash (equal shingles ⇒
  * equal hashes; collisions ~2^-64), so downstream results are
  * unchanged in distribution and the DuckDB string-shingle oracles
  * still match on counts.
  *
  * Docs shorter than n tokens produce an empty array.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle width must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val out = new Array[Long](math.max(0, m - n + 1))
    var i = 0
    while (i < out.length) {
      var acc = 42L
      var j = 0
      while (j < n) {
        acc = XXH64.hashLong(hs.getLong(i + j), acc)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = $hs.numElements();
         |final long[] $out = new long[java.lang.Math.max(0, $m - $n + 1)];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  long $acc = 42L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc = $xxh.hashLong($hs.getLong($i + $j), $acc);
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash (Charikar, STOC'02 — public algorithm) over a
  * token-hash array: bit b of the result is set iff, summing a ±1 vote
  * per token (+1 when bit b of the token's hash is set), the total is
  * positive. Bit-identical to the staged HoF formulation in
  * [[graft.functions.TextFunctions.simhashCounts]] /
  * `simhashFromCounts` (ExpressionParitySpec asserts both equalities).
  *
  * Why native (SURVEY.md §7.3): the HoF version is interpreted
  * (CodegenFallback) and allocates three 64-element boxed arrays per
  * token per row; this is a primitive int[64] loop inside whole-stage
  * codegen. Empty input yields 0L (no bits set), matching the HoF
  * fold's zero start.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $m = $hs.numElements();
         |final int[] $votes = new int[64];
         |for (int $i = 0; $i < $m; $i++) {
         |  final long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

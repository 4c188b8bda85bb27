package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native hashing-trick featurizer: array<string> tokens → array<long>
  * of `dim` signed slot weights in ONE fused pass — per token a 31-base
  * char fold mod P (plain arithmetic, the DuckDB oracle replays it
  * bit-for-bit), slot = h mod dim, sign = bit dim of h, accumulated
  * into a single output array.
  *
  * Why native: the expression-only formulation (transform over
  * sequence(dim) × aggregate over tokens × aggregate over split chars)
  * is three nested HigherOrderFunctions — interpreted closures, re-
  * walking the token array `dim` times per document; at sf0.1 it
  * benched 25s where every sibling text op sits under 1s. This loop is
  * the same arithmetic in generated Java: one walk, zero temporaries.
  * Char semantics: UTF-16 units (Java charAt) = code points for BMP
  * text, identical to ascii() per split char in both engines for the
  * ASCII corpora this tokenizer targets. */
case class FeatureHashVec(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim > 0 && dim <= (1 << 20), s"dim must be in [1, 2^20], got $dim")
  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_vec expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val out = new Array[Long](dim)
    var j = 0
    val n = toks.numElements()
    while (j < n) {
      if (!toks.isNullAt(j)) {
        val s = toks.getUTF8String(j).toString
        var h = 0L
        var i = 0
        while (i < s.length) {
          h = (h * 31 + s.charAt(i)) % P
          i += 1
        }
        val slot = (h % dim).toInt
        out(slot) += (if ((h / dim) % 2 == 0) 1L else -1L)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val slot = ctx.freshName("slot")
      s"""
         |long[] $out = new long[$dim];
         |int $n = $toks.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$toks.isNullAt($j)) {
         |    String $s = $toks.getUTF8String($j).toString();
         |    long $h = 0L;
         |    for (int $i = 0; $i < $s.length(); $i++) {
         |      $h = ($h * 31 + $s.charAt($i)) % ${P}L;
         |    }
         |    int $slot = (int) ($h % $dim);
         |    $out[$slot] += (($h / $dim) % 2 == 0) ? 1L : -1L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

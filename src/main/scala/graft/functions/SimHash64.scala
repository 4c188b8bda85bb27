package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit unweighted SimHash over an array of feature hashes: bit j of the
  * result is set iff more elements have bit j set than clear.
  *
  * The expression-only formulation (nested `aggregate` over
  * sequence(0,63) × hs) evaluates 64·|hs| interpreted lambda calls per
  * document — the dominant cost of the SimHash stage. This native version
  * is one compiled pass: per element, one popcount-style unpacking into 64
  * counters; identical bit semantics (ties → bit clear, matching
  * `sum(±1) > 0`).
  *
  * Null elements are skipped; empty/all-null input returns null (an
  * all-zero sentinel would collide every empty doc into one band bucket).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val total = hs.numElements()
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < total) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
        n += 1
      }
      i += 1
    }
    if (n == 0) return null
    var sim = 0L
    var j = 0
    while (j < 64) {
      // bit set iff strictly more ones than zeros (sum(±1) > 0)
      if (2 * counts(j) > n) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val total = ctx.freshName("total")
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
         |int $total = $hs.numElements();
         |int[] $counts = new int[64];
         |int $n = 0;
         |for (int $i = 0; $i < $total; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $counts[$j] += (int) (($h >>> $j) & 1L);
         |    }
         |    $n++;
         |  }
         |}
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long $sim = 0L;
         |  for (int $j = 0; $j < 64; $j++) {
         |    if (2 * $counts[$j] > $n) $sim |= (1L << $j);
         |  }
         |  ${ev.value} = $sim;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

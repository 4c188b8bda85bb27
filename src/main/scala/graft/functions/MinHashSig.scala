package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: from an array of shingle hashes, compute the
  * 32 packed band values (m_{2b}*P + m_{2b+1}, permutation j with
  * a_j=(2j+1)*K mod P, offset j*B) in ONE pass per band pair — no
  * intermediate arrays. The expression-only formulation
  * (transform→array_min ×64) allocates 64 temporary arrays per document;
  * this loop allocates one output array, which is what the signature stage
  * costs at 10^9 documents. Same arithmetic as DedupOps' SQL form, so
  * signatures are interchangeable.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  private val P = 1000000007L
  private val K = 2654435761L
  private val B = 40503L
  private val bands = 32

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty input -> null signature (an all-identical sentinel would make
  // every empty doc collide in every LSH band and flood the candidate join)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val total = hs.numElements()
    // One pass to pre-mod the hashes, skipping null elements (user-facing
    // arrays may carry containsNull=true); also avoids re-walking ArrayData
    // 32 times in the band loop.
    val pre = new Array[Long](total)
    var n = 0
    var j = 0
    while (j < total) {
      if (!hs.isNullAt(j)) {
        pre(n) = ((hs.getLong(j) % P) + P) % P
        n += 1
      }
      j += 1
    }
    if (n == 0) return null
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val a0 = ((4L * b + 1) * K) % P
      val a1 = ((4L * b + 3) * K) % P
      val c0 = (2L * b) * B
      val c1 = (2L * b + 1) * B
      var m0 = Long.MaxValue
      var m1 = Long.MaxValue
      var i = 0
      while (i < n) {
        val hp = pre(i)
        val v0 = (a0 * hp + c0) % P
        val v1 = (a1 * hp + c1) % P
        if (v0 < m0) m0 = v0
        if (v1 < m1) m1 = v1
        i += 1
      }
      out(b) = m0 * P + m1
      b += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val a0 = ctx.freshName("a0")
      val a1 = ctx.freshName("a1")
      val c0 = ctx.freshName("c0")
      val c1 = ctx.freshName("c1")
      val m0 = ctx.freshName("m0")
      val m1 = ctx.freshName("m1")
      val hp = ctx.freshName("hp")
      val v0 = ctx.freshName("v0")
      val v1 = ctx.freshName("v1")
      val total = ctx.freshName("total")
      val pre = ctx.freshName("pre")
      val jj = ctx.freshName("j")
      s"""
         |int $total = $hs.numElements();
         |long[] $pre = new long[$total];
         |int $n = 0;
         |for (int $jj = 0; $jj < $total; $jj++) {
         |  if (!$hs.isNullAt($jj)) {
         |    $pre[$n++] = (($hs.getLong($jj) % ${P}L) + ${P}L) % ${P}L;
         |  }
         |}
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $a0 = ((4L * $b + 1) * ${K}L) % ${P}L;
         |  long $a1 = ((4L * $b + 3) * ${K}L) % ${P}L;
         |  long $c0 = (2L * $b) * ${B}L;
         |  long $c1 = (2L * $b + 1) * ${B}L;
         |  long $m0 = Long.MAX_VALUE, $m1 = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $hp = $pre[$i];
         |    long $v0 = ($a0 * $hp + $c0) % ${P}L;
         |    long $v1 = ($a1 * $hp + $c1) % ${P}L;
         |    if ($v0 < $m0) $m0 = $v0;
         |    if ($v1 < $m1) $m1 = $v1;
         |  }
         |  $out[$b] = $m0 * ${P}L + $m1;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Wide SimHash signature: `nWords` independent 64-bit unweighted
  * SimHashes (64·nWords bits total) over an array of feature hashes,
  * computed in ONE pass. Word s is the SimHash of the input re-mixed with
  * seed s — a splitmix64-style finalizer, so the bit families are
  * pairwise independent even though only one 64-bit base hash is stored
  * per shingle. The first k words are identical for any nWords >= k, so
  * widening the signature never invalidates existing band keys.
  *
  * Why wide signatures when SimHash64 exists: LSH banding needs band keys
  * with real entropy, and the entropy a band can carry is bits/band ×
  * bands — both paid for in signature width. At the measured operating
  * point (J >= 0.8 pairs flip ~6% of signature bits, random pairs ~50%),
  * a w-bit band collides with probability (1-p)^w >= 0.94^w for true
  * pairs and 2^-w for random ones, so:
  *   - w must be large enough that a natural bucket (n/2^w docs) stays
  *     below the LSH width cap: w >= log2(n / cap) — 16 bits carry a
  *     65k-doc-per-bucket corpus (n ~ 65M at cap 1000), 26 bits carry
  *     n ~ 6.7e10.
  *   - the band count B sets the miss probability (1 - 0.94^w)^B: at
  *     w=16, B=32 → ~4e-7; at w=26, B=64 (1664 bits, 26 words) → ~6e-7.
  * Both grow O(log n): the signature is O(log² n) bits per doc — the
  * price of sub-quadratic candidate generation at a loose (J=0.8)
  * threshold, where classic 64-bit SimHash banding (Manku's hamming<=3
  * regime) does not apply.
  *
  * Bit semantics per word match SimHash64 (ties -> bit clear). Null
  * elements are skipped; empty/all-null input returns null (an all-zero
  * sentinel would collide every empty doc into one band bucket).
  */
case class SimHashSig(child: Expression, nWords: Int = SimHashSig.DefaultWords)
    extends UnaryExpression {
  require(nWords > 0 && nWords <= 64, s"nWords must be in [1, 64], got $nWords")
  private val NSeeds = nWords

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val total = hs.numElements()
    val counts = new Array[Int](NSeeds * 64)
    var n = 0
    var i = 0
    while (i < total) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var s = 0
        while (s < NSeeds) {
          var z = h + (s + 1) * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^= (z >>> 31)
          val base = s << 6
          var j = 0
          while (j < 64) {
            counts(base + j) += ((z >>> j) & 1L).toInt
            j += 1
          }
          s += 1
        }
        n += 1
      }
      i += 1
    }
    if (n == 0) return null
    val out = new Array[Long](NSeeds)
    var s = 0
    while (s < NSeeds) {
      var w = 0L
      val base = s << 6
      var j = 0
      while (j < 64) {
        // bit set iff strictly more ones than zeros (sum(±1) > 0)
        if (2 * counts(base + j) > n) w |= (1L << j)
        j += 1
      }
      out(s) = w
      s += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val total = ctx.freshName("total")
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      s"""
         |int $total = $hs.numElements();
         |int[] $counts = new int[${NSeeds * 64}];
         |int $n = 0;
         |for (int $i = 0; $i < $total; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $h = $hs.getLong($i);
         |    for (int $s = 0; $s < $NSeeds; $s++) {
         |      long $z = $h + ($s + 1) * 0x9E3779B97F4A7C15L;
         |      $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |      $z ^= ($z >>> 31);
         |      int $base = $s << 6;
         |      for (int $j = 0; $j < 64; $j++) {
         |        $counts[$base + $j] += (int) (($z >>> $j) & 1L);
         |      }
         |    }
         |    $n++;
         |  }
         |}
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $out = new long[$NSeeds];
         |  for (int $s = 0; $s < $NSeeds; $s++) {
         |    long $w = 0L;
         |    int $base = $s << 6;
         |    for (int $j = 0; $j < 64; $j++) {
         |      if (2 * $counts[$base + $j] > $n) $w |= (1L << $j);
         |    }
         |    $out[$s] = $w;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  /** Default 8 seeded words = 512 signature bits = 32 bands of 16 bits —
    * sized for corpora up to ~65M docs at the default LSH width cap;
    * widen per the scaling law in the class scaladoc beyond that. */
  val DefaultWords = 8
}

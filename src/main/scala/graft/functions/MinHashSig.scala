package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: from an array of shingle hashes, compute
  * `bands` packed band values in ONE pass — no intermediate arrays. Band
  * k packs its `rows` minima by polynomial accumulation (v = v*P + m,
  * 64-bit wrap; equal bands always pack equal, a wrap collision can only
  * ADD a candidate, never lose one, and candidates are exact-verified
  * downstream). Permutation j = k*rows + i is the affine map
  * a_j·x + c_j mod P with INDEPENDENT splitmix-derived constants
  * ([[MinHashSig.permA]]/[[MinHashSig.permC]]). Independence across the
  * rows of a band is LOAD-BEARING, not hygiene: the retired r15 family
  * a_j = (2j+1)·K mod P, c_j = j·B is linear in j, so every shingle's
  * hash advances on an arithmetic progression across consecutive
  * permutations — h_j(x) = h_0(x) + j·(2Kx + B) mod P — and a shingle
  * whose hash AND step are both small stays the minimum for every row
  * of a band at once. One shared shingle then collides the whole band
  * with probability ~J instead of J^rows, which the r16 synthetic-
  * decade instrument measured as candidate exponent 1.43 (SCALING.md);
  * with independent constants it re-measures at 1.00. The
  * expression-only formulation (transform→array_min per permutation)
  * allocates one temporary array per permutation per document; this
  * loop allocates one output array, which is what the signature stage
  * costs at 10^9 documents.
  *
  * Why rows-per-band is a parameter: a pair with Jaccard J collides in
  * a band with probability J^rows (GIVEN the per-row independence
  * above), so the background candidate rate is
  * bands·J_bg^rows·C(n,2). For any FIXED rows that term is quadratic in
  * n; it stays sub-linear only while J_bg^rows < 1/n, i.e. rows must
  * grow ~ln(n)/ln(1/J_bg) — the same O(log n) scaling law as
  * SimHashSig's band width. The default r=6, b=32 (192 permutations)
  * carries a J_bg≈0.05 corpus to n ~ 10^8 docs with candidate exponent
  * ~1 (measured in SCALING.md; r=2 read exponent 1.84 on the same
  * corpus), while missing a J>=0.8 true pair with probability
  * (1-0.8^6)^32 ≈ 6e-5 (J>=0.9: 3e-11).
  */
case class MinHashSig(child: Expression,
    rows: Int = MinHashSig.DefaultRows,
    bands: Int = MinHashSig.DefaultBands) extends UnaryExpression {
  require(rows > 0 && bands > 0 && rows * bands <= 4096,
    s"rows*bands must be in [1, 4096], got $rows x $bands")
  private val P = MinHashSig.P
  // independent per-permutation multipliers/offsets, precomputed once
  // per expression instance (rows*bands <= 4096 longs)
  private val permAs = Array.tabulate(rows * bands)(MinHashSig.permA)
  private val permCs = Array.tabulate(rows * bands)(MinHashSig.permC)

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
    // once per permutation in the band loop.
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
      var packed = 0L
      var r = 0
      while (r < rows) {
        val perm = b * rows + r
        val a = permAs(perm)
        val c = permCs(perm)
        var m = Long.MaxValue
        var i = 0
        while (i < n) {
          val v = (a * pre(i) + c) % P
          if (v < m) m = v
          i += 1
        }
        packed = packed * P + m
        r += 1
      }
      out(b) = packed
      b += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val perm = ctx.freshName("perm")
      val aArr = ctx.addReferenceObj("minhashPermA", permAs, "long[]")
      val cArr = ctx.addReferenceObj("minhashPermC", permCs, "long[]")
      val a = ctx.freshName("a")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val packed = ctx.freshName("packed")
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
         |  long $packed = 0L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    int $perm = $b * $rows + $r;
         |    long $a = $aArr[$perm];
         |    long $c = $cArr[$perm];
         |    long $m = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $v = ($a * $pre[$i] + $c) % ${P}L;
         |      if ($v < $m) $m = $v;
         |    }
         |    $packed = $packed * ${P}L + $m;
         |  }
         |  $out[$b] = $packed;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** r=6 rows/band × b=32 bands = 192 permutations — the S-curve sits at
    * J* = (1/32)^(1/6) ≈ 0.56; sized per the scaling law in the class
    * scaladoc. Raise `rows` as the corpus grows — [[famRows]] is that
    * dial packaged as a discrete escalation ladder. */
  val DefaultRows = 6
  val DefaultBands = 32

  /** Highest band family the escalation ladder supports: family 5 =
    * 15×272 = 4080 permutations, the last rung under the 4096 cap.
    * An armed precision floor that is still tripped at MaxFamily
    * surfaces loudly instead of escalating further. */
  val MaxFamily = 5

  /** The PRECISION-ESCALATION geometry ladder (band family >= 2;
    * family 1 is the retired linear-constants family, refused by every
    * index reader). Family f bands with (famRows(f), famBands(f)) over
    * the same independent permutation stream: rows grow by 3 per rung —
    * the "rows must grow ~log n" scaling law of the class scaladoc,
    * applied when a measured precision floor trips instead of on a
    * corpus-count schedule — and bands re-derive so the miss
    * probability at J = 0.8 stays pinned at family 2's
    * (1 − 0.8^6)^32 ≈ 6e-5: an escalation that restored candidate
    * precision by silently paying recall would be the exact
    * silent-quality-collapse failure mode the floor exists to stop. */
  def famRows(fam: Int): Int = {
    require(fam >= 2 && fam <= MaxFamily,
      s"band family must be in [2, $MaxFamily], got $fam")
    DefaultRows + 3 * (fam - 2)
  }

  /** Bands for family `fam` — smallest count holding the J=0.8 miss
    * probability at or under family 2's pinned value (exactly 32 at
    * family 2 by construction; the 1e-9 slack absorbs the float
    * division landing an ulp above the exact integer). */
  def famBands(fam: Int): Int = {
    val r = famRows(fam)
    val lnMissTarget =
      DefaultBands * math.log(1 - math.pow(0.8, DefaultRows))
    math.ceil(lnMissTarget / math.log(1 - math.pow(0.8, r)) - 1e-9).toInt
  }

  val P = 1000000007L

  /** splitmix64 finalizer — the per-permutation constant derivation.
    * Deterministic and engine-neutral: consumers that need a portable
    * twin (the precision probe's banding, its DuckDB oracle) interpolate
    * the RESULTING constants as literals rather than replaying this. */
  private def mix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Permutation j's multiplier in [1, P-1] — INDEPENDENT draws (see the
    * class scaladoc on why the retired linear family was a defect). */
  def permA(j: Int): Long = (mix64(j.toLong * 2 + 1) & Long.MaxValue) % (P - 1) + 1

  /** Permutation j's offset in [0, P-1]. */
  def permC(j: Int): Long = (mix64(j.toLong * 2 + 2) & Long.MaxValue) % P
}

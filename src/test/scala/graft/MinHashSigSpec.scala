package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native MinHashSig expression must match a straightforward Scala
  * reference implementation bit-for-bit (codegen and interpreted paths).
  * The reference is written independently of the expression's codegen;
  * the band pack uses the same wrapping 64-bit polynomial accumulation
  * (a pure-SQL mirror is impossible under ANSI mode — the pack overflows
  * bigint by design, which is safe for a JOIN KEY). */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }
  private val P = graft.functions.MinHashSig.P

  // the reference shares only the per-permutation CONSTANTS with the
  // expression (like P itself); the minhash/pack computation is written
  // independently of the expression's codegen
  private def reference(hs: Seq[Long], rows: Int, bands: Int): Seq[Long] = {
    val pre = hs.map(h => ((h % P) + P) % P)
    (0 until bands).map { b =>
      (0 until rows).foldLeft(0L) { (packed, r) =>
        val perm = b * rows + r
        val a = graft.functions.MinHashSig.permA(perm)
        val c = graft.functions.MinHashSig.permC(perm)
        packed * P + pre.map(hp => (a * hp + c) % P).min
      }
    }
  }

  test("native expression == reference implementation on corpus hash arrays") {
    import graft.functions.MinHashSig.{DefaultRows, DefaultBands}
    val rows = graft.operators.DedupOps.docHashes(spark, TestSpark.sf0001)
      .select(col("hs"), expr("minhash_sig(hs)").as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(r.getSeq[Long](1) == reference(hs, DefaultRows, DefaultBands),
        s"mismatch for hs=$hs")
    }
  }

  test("rows/bands are parameters (the log-n scaling dial)") {
    import spark.implicits._
    val hs = Seq(7L, -11L, 13L, Long.MaxValue)
    val df = Seq((1L, hs)).toDF("id", "hs")
    val sig = df.select(expr("minhash_sig(hs, 2, 16)")).collect()(0).getSeq[Long](0)
    assert(sig == reference(hs, 2, 16))
  }

  test("handles negative hashes and empty arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(-42L, Long.MinValue + 1, Long.MaxValue, 0L)),
      (2L, Seq.empty[Long]),
    ).toDF("id", "hs")
    val rows = df.select(col("id"), expr("minhash_sig(hs)").as("sig")).collect()
    val nonEmpty = rows.find(_.getLong(0) == 1L).get
    assert(nonEmpty.getSeq[Long](1).length == 32)
    // empty input -> null signature (identical sentinels would collide
    // every empty doc in every LSH band)
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("null elements are skipped, not read as garbage") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Long]](Some(7L), None, Some(99L))),
      (2L, Seq[Option[Long]](Some(7L), Some(99L))),
      (3L, Seq[Option[Long]](None, None)),
    ).toDF("id", "hs")
    val rows = df.select(col("id"), expr("minhash_sig(hs)").as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    // signature over {7, null, 99} == signature over {7, 99}
    assert(rows(1L) == rows(2L))
    // all-null behaves like empty: null signature
    assert(rows(3L) == null)
  }
}

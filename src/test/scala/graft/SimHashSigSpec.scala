package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SimHashSig}

/** The native 512-bit seeded SimHash must match a straightforward Scala
  * reference implementation word-for-word on the real corpus, and handle
  * null/empty edges like SimHash64 does. */
class SimHashSigSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  // reference implementation: same splitmix64-style seed mix and the
  // SimHash64 tie rule (sum(±1) > 0), written independently of the
  // expression's codegen
  private def mix(h: Long, seed: Int): Long = {
    var z = h + (seed + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def reference(hs: Seq[Long], nWords: Int = SimHashSig.DefaultWords): Seq[Long] =
    (0 until nWords).map { s =>
      val mixed = hs.map(mix(_, s))
      (0 until 64).foldLeft(0L) { (acc, j) =>
        val ones = mixed.count(z => ((z >>> j) & 1L) == 1L)
        if (2 * ones > mixed.size) acc | (1L << j) else acc
      }
    }

  test("native == reference implementation on corpus hash arrays") {
    val rows = graft.operators.DedupOps.docHashes(spark, TestSpark.sf0001)
      .select(col("hs"), expr("simhash_sig(hs)").as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(r.getSeq[Long](1) == reference(hs), s"mismatch for hs=$hs")
    }
  }

  test("null elements skipped; empty and all-null yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Long]](Some(-1L), None, Some(3L))),
      (2L, Seq[Option[Long]](Some(-1L), Some(3L))),
      (3L, Seq.empty[Option[Long]]),
      (4L, Seq[Option[Long]](None)),
    ).toDF("id", "hs")
    val out = df.select(col("id"), expr("simhash_sig(hs)").as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    assert(out(1L) == out(2L) && out(1L).isDefined)
    assert(out(1L).get == reference(Seq(-1L, 3L)))
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("signature words are seed-independent bit families") {
    import spark.implicits._
    // identical inputs agree on all words; the words themselves differ
    // from each other (the seeds actually decorrelate)
    val df = Seq((1L, Seq(7L, 11L, 13L, 17L, 19L))).toDF("id", "hs")
    val sig = df.select(expr("simhash_sig(hs)")).collect()(0).getSeq[Long](0)
    assert(sig.size == SimHashSig.DefaultWords)
    assert(sig.distinct.size == SimHashSig.DefaultWords, s"correlated words: $sig")
  }

  test("widening the signature preserves existing words (prefix property)") {
    import spark.implicits._
    // the scaling law widens signatures as the corpus grows; band keys
    // derived from the first k words must not change when nWords does
    val df = Seq((1L, Seq(7L, 11L, 13L, 17L, 19L, 23L))).toDF("id", "hs")
    val narrow = df.select(expr("simhash_sig(hs)")).collect()(0).getSeq[Long](0)
    val wide = df.select(expr("simhash_sig(hs, 13)")).collect()(0).getSeq[Long](0)
    assert(wide.size == 13)
    assert(wide.take(SimHashSig.DefaultWords) == narrow)
    assert(wide == reference(Seq(7L, 11L, 13L, 17L, 19L, 23L), 13))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Containment dedup (q_containment): the asymmetric certificate must
  * catch subset duplicates that symmetric Jaccard structurally misses,
  * and agree with Jaccard's certificate where the two overlap. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a subset doc is caught by containment and missed by jaccard") {
    import spark.implicits._
    // doc 2 is the verbatim first quarter of doc 1 (a quoted article, a
    // press-release repost): its shingle set is a strict subset, so
    // containment = 1.0 while Jaccard ~ |A|/|B| ~ 0.24 — below every
    // symmetric near-dup threshold. doc 3 is unrelated.
    val words = (0 until 120).map(i => s"tok${i}w").toIndexedSeq
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, words.take(30).mkString(" ")),
      (3L, (0 until 60).map(i => s"other${i}z").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = DedupOps.containmentOf(spark, docs).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getDouble(2) === 1.0, "strict shingle subset => containment 1.0")
    assert(r.getDouble(3) < 0.8,
      s"the pair must be INVISIBLE to jaccard dedup, got ${r.getDouble(3)}")
  }

  test("bottom-k path finds the subset pair the exact path certifies") {
    import spark.implicits._
    val words = (0 until 120).map(i => s"tok${i}w").toIndexedSeq
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, words.take(30).mkString(" ")),
      (3L, (0 until 60).map(i => s"other${i}z").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = DedupOps.containmentBottomKOf(spark, docs).collect()
    assert(rows.length === 1)
    assert((rows.head.getLong(0), rows.head.getLong(1)) === (1L, 2L))
    assert(rows.head.getDouble(2) === 1.0)
  }

  test("bottom-k candidates reproduce the exact certificate on sf0.001") {
    // the sampling argument in practice: every exact containment pair
    // must surface through a bottom-k probe collision (P(miss) <= 1e-8
    // per pair), with identical measures — the minhash==exact pattern.
    val exact = DedupOps.queries("q_containment")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    val bk = DedupOps.queries("q_containment_bottomk")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(exact.nonEmpty)
    assert(bk === exact)
  }

  test("flat posting truncation bounds a flood; the disjoint pair survives") {
    import spark.implicits._
    // 100 docs share one verbatim passage: its shingles have df = 100 —
    // UNDER the relative cap (1000), which is exactly the regime where
    // the relative cap bounds nothing. With postingCap = 5 each flooded
    // shingle exposes only its 5 smallest doc_ids, so candidates are
    // k·docs·cap-bounded; the planted subset pair (disjoint vocabulary)
    // must still be certified, and the flood keeps star connectivity
    // through its smallest-id representatives.
    val words = (0 until 120).map(i => s"tok${i}w").toIndexedSeq
    val shared = (0 until 40).map(i => s"flood${i}f").mkString(" ")
    val docs = (Seq(
      (1L, words.mkString(" ")),
      (2L, words.take(30).mkString(" "))
    ) ++ (10L until 110L).map(i => (i, shared))).toDF("doc_id", "text")
    val cand = DedupOps.containmentBottomKCandidates(spark, docs,
      postingCap = 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), "the subset pair must stay a candidate")
    // every candidate from the flood involves one of its 5 smallest ids
    val reps = (10L until 15L).toSet
    cand.filter(p => p._1 >= 10L).foreach { p =>
      assert(reps.contains(p._1) || reps.contains(p._2),
        s"flood pair $p bypassed the posting truncation")
    }
    // 8 probes x cap 5 per flood doc is the bound; the flood must not
    // enumerate its C(100,2) = 4950 pairs
    assert(cand.size <= 2 + 100 * 5 * 8)
    val res = DedupOps.containmentBottomKOf(spark, docs, postingCap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.contains((1L, 2L)),
      "the subset pair must be certified under truncation")
    assert(res.exists(p => reps.contains(p._1) && p._2 >= 10L),
      "flood members must stay certified against a representative")
  }

  test("containment >= jaccard, and high-jaccard pairs are contained") {
    // C = inter/min >= inter/union = J for every pair; in particular a
    // J >= 0.9 pair can never be missed by the 0.9 containment gate.
    val cont = DedupOps.queries("q_containment")(spark, TestSpark.sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    cont.values.foreach { case (c, j) =>
      assert(c >= j - 1e-12 && c >= DedupOps.ContainmentThreshold)
    }
    val highJ = DedupOps.queries("q_ngram_jaccard")(spark, TestSpark.sf0001)
      .filter(col("jaccard") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(highJ.nonEmpty, "corpus has planted near-identical pairs")
    highJ.foreach(p => assert(cont.contains(p),
      s"J>=0.9 pair $p missing from the containment certificate"))
  }
}

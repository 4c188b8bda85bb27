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

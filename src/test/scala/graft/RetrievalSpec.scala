package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps

/** q_bm25_topk / q_hybrid_rrf vs an independent pure-Scala recomputation
  * over the sf0.001 corpus: tokenization, BM25 (k1=1.2, b=0.75,
  * Lucene-form idf ln(1 + (N-df+0.5)/(df+0.5))), leg ranking, and the
  * reciprocal-rank fusion are all re-derived here from the raw parquet
  * text/embeddings with plain collections — no Spark expressions shared
  * with the implementation — so a formula or ranking bug cannot hide in
  * a common subplan. (The DuckDB oracle is the cross-engine check; this
  * spec is the cross-IMPLEMENTATION check.)
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  /** (docTokens, df, nDocs, avgdl) over the corpus. */
  private lazy val corpus: (Map[Long, Seq[String]], Map[String, Int], Int, Double) = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tokenize(r.getString(1))).toMap
    val df = docs.values.flatMap(_.distinct).groupBy(identity).map {
      case (t, o) => t -> o.size
    }
    val avgdl = docs.values.map(_.length).sum.toDouble / docs.size
    (docs, df, docs.size, avgdl)
  }

  /** Per-term BM25 contributions; empty iff the doc matched no query term
    * (the engine's posting join emits a doc iff it matched, whatever the
    * rounded sum). */
  private def bm25(queryTerms: Seq[String], docId: Long): Seq[Double] = {
    val (docs, df, n, avgdl) = corpus
    val toks = docs(docId)
    val tfm = toks.groupBy(identity).map { case (t, o) => t -> o.size }
    queryTerms.distinct.flatMap { term =>
      for (tf <- tfm.get(term); d <- df.get(term)) yield {
        val idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
      }
    }
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_bm25_topk matches a pure-Scala BM25 recomputation") {
    val (docs, _, _, _) = corpus
    val got = RetrievalOps.queries("q_bm25_topk")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    RetrievalOps.BmQueries.foreach { case (qid, qtext) =>
      val terms = qtext.split(" ").toSeq
      val want = docs.keys.toSeq
        .map(id => (id, bm25(terms, id)))
        .filter(_._2.nonEmpty)
        .map { case (id, cs) => (id, round4(cs.sum)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(RetrievalOps.Bm25TopK)
        .zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
      val gotQ = got.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(gotQ == want, s"query $qid ($qtext)")
    }
  }

  test("q_hybrid_rrf fuses the recomputed legs by reciprocal rank") {
    val (docs, _, _, _) = corpus
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queryIds = docs.keys.filter(id =>
      id % RetrievalOps.HybridQueryMod == RetrievalOps.HybridQueryRes &&
        id < RetrievalOps.HybridQueryIdCap).toSeq.sorted
    assert(queryIds.nonEmpty, "schedule must select at least one query doc")

    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    val got = RetrievalOps.queries("q_hybrid_rrf")(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))
    }
    assert(got.nonEmpty)

    queryIds.foreach { qid =>
      val lexRk = docs.keys.toSeq.filter(_ != qid)
        .map(id => (id, bm25(docs(qid).distinct, id)))
        .filter(_._2.nonEmpty)
        .map { case (id, cs) => (id, round4(cs.sum)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(RetrievalOps.LegTopK)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val vecRk = emb.keys.toSeq.filter(_ != qid)
        .map(id => (id, cosine(emb(qid), emb(id))))
        .sortBy { case (id, s) => (-s, id) }
        .take(RetrievalOps.LegTopK)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val want = (lexRk.keySet ++ vecRk.keySet).toSeq
        .map { id =>
          val rrf = lexRk.get(id).map(r => 1.0 / (RetrievalOps.RrfK + r)).getOrElse(0.0) +
            vecRk.get(id).map(r => 1.0 / (RetrievalOps.RrfK + r)).getOrElse(0.0)
          (id, BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(RetrievalOps.FusedTopK)
        .zipWithIndex.map { case ((id, s), i) =>
          (qid, i + 1, id, s, lexRk.get(id), vecRk.get(id))
        }
      val gotQ = got.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(gotQ == want, s"query doc $qid")
    }
  }
}

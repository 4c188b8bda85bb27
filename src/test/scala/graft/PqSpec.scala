package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Product-quantization invariants (q_embed_pq). The DuckDB oracle pins
  * the end-to-end hash; these tests pin the family's structural contract
  * so a silent geometry / tie-break / schedule change fails locally:
  *   - the (M, K) budget is SCHEDULED (pqSubspacesFor / pqCodebookFor,
  *     r15 verdict #2) — integer-exact, divisor-safe, ladder-clamped,
  *   - codebook training is deterministic and driver-small (M·K rows),
  *   - every emitted code is the true argmin sub-centroid (brute-force
  *     cross-check against the collected codebooks, ties to lowest cell),
  *   - the portable `cs` presentation is exactly the m-ascending code
  *     join.
  * Mirrors AnnSpec's structure (collected small-fixture cross-checks). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = {
    functions.GraftFunctions.register(spark)
    Tables.spread(spark, Tables.embeddings(spark, TestSpark.sf0001))
  }

  private lazy val corpusN = embeddings.count()
  private lazy val dim = embeddings.select(size(col("embedding")).as("n"))
    .limit(1).collect()(0).getInt(0)
  private lazy val M = VectorOps.pqSubspacesFor(dim)
  private lazy val K = VectorOps.pqCodebookFor(corpusN)
  private lazy val subDim = dim / M

  private def collectBooks(): Map[(Int, Int), Seq[Float]] =
    VectorOps.trainPqCodebooks(spark, embeddings, subDim, M, K)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toSeq))
      .toMap

  test("budget schedules are integer-exact: M the divisor closest to the " +
      "target sub-width, K the largest affordable ladder step") {
    // M: every divisor candidate checked, ties to the smaller M
    assert(VectorOps.pqSubspacesFor(64) == 8)   // 8-dim sub-vectors
    assert(VectorOps.pqSubspacesFor(128) == 16) // capped by PqMaxSubspaces
    assert(VectorOps.pqSubspacesFor(96) == 12)  // 96/12 = 8 exactly
    assert(VectorOps.pqSubspacesFor(60) == 6)   // |10-8| < |12-8| ... 60/6=10 vs 60/10=6: both |2|, ties low -> 6
    assert(VectorOps.pqSubspacesFor(7) == 1)    // prime dim: only divisor
    // K: power-of-two ladder, 8 sample rows per centroid, n/4 sample
    assert(VectorOps.pqCodebookFor(100) == 16)   // floor
    assert(VectorOps.pqCodebookFor(511) == 16)   // 16*32=512 > 511
    assert(VectorOps.pqCodebookFor(1024) == 32)
    assert(VectorOps.pqCodebookFor(2000) == 32)  // the sf0.1 fixture count
    assert(VectorOps.pqCodebookFor(8192) == 256) // the canonical 8-bit
    assert(VectorOps.pqCodebookFor(100000000L) == 256) // ceiling holds
  }

  test("codebooks are driver-small (exactly M*K rows) and deterministic " +
      "across two trainings (FLOAT-rounding convention)") {
    val a = collectBooks()
    val b = collectBooks()
    // every (m, cell) present, subDim-wide — the driver-smallness
    // contract: M*K*subDim floats regardless of corpus size. K cells
    // exist because the fixture sample (n/4 = 125) exceeds K = 16 seeds.
    assert(a.size == M * K, s"expected ${M * K} codebook rows, got ${a.size}")
    assert(a.keySet == (for (m <- 0 until M; c <- 0 until K)
      yield (m, c)).toSet)
    a.values.foreach(pc => assert(pc.length == subDim))
    // bit-identical retrain: seeds are phash-ordered (not data-order) and
    // each Lloyd round casts through FLOAT, absorbing accumulation-order
    // last-ulp noise — the same convention that keeps the oracle replay
    // hash-identical
    assert(a == b, "two trainings on the same frame diverged")
  }

  test("every emitted code is the argmin sub-centroid (ties to lowest " +
      "cell) and `cs` is the m-ascending ':' join") {
    val books = collectBooks()
    val embs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val out = VectorOps.queries("q_embed_pq")(spark, TestSpark.sf0001)
      .collect()
    assert(out.length == embs.size, "one code row per corpus vector")
    out.foreach { r =>
      val (id, cs) = (r.getLong(0), r.getString(1))
      val cells = cs.split(':').map(_.toInt).toSeq
      assert(cells.length == M, s"vec $id: ${cells.length} codes != $M")
      // brute-force argmin per subspace, replaying pqSqDist's DOUBLE
      // position-ascending fold exactly
      val emb = embs(id)
      for (m <- 0 until M) {
        val sv = emb.slice(m * subDim, (m + 1) * subDim)
        val d2 = (0 until K).map { c =>
          val pc = books((m, c))
          c -> sv.zip(pc).foldLeft(0d) { case (acc, (x, y)) =>
            acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
          }
        }
        val best = d2.minBy { case (c, d) => (d, c) }._1
        assert(cells(m) == best,
          s"vec $id subspace $m: code ${cells(m)} != argmin $best")
        assert(cells(m) >= 0 && cells(m) < K)
      }
    }
  }

  test("ADC search recall@5 vs brute force (the q_ann_recall convention)") {
    val brute = VectorOps.queries("q_ann_brute")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = VectorOps.queries("q_embed_pq_search")(spark, TestSpark.sf0001)
      .collect()
    val byQuery = adc.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(2)).sorted
      assert(ranks.length <= 5)
      assert(ranks.toSeq == (1 to ranks.length))
    }
    val got = adc.map(r => (r.getLong(0), r.getLong(1))).toSet
    // ADC ranks by squared-L2-to-sub-centroids, brute by cosine on the
    // raw floats. The r16 schedule doubles the fixture budget (8
    // subspaces x 16 cells = 32 bits/vector) vs the retired fixed 4x16:
    // observed recall 0.12 -> 0.18 at this 500-vector fixture. The floor
    // pins the scheduled budget's observed deterministic value with
    // margin only for ordering ties, so a silent regression in the
    // lookup table, the tie-break, or the schedule itself fails the spec
    val recall = brute.intersect(got).size.toDouble / brute.size
    info(s"adc recall@5 = $recall (M=$M, K=$K)")
    assert(recall >= 0.15, s"adc recall@5 = $recall")
  }
}

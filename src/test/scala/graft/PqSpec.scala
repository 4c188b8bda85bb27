package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Product-quantization invariants (q_embed_pq). The DuckDB oracle pins
  * the end-to-end hash; these tests pin the family's structural contract
  * so a silent geometry / tie-break / packing change fails locally:
  *   - codebook training is deterministic and driver-small (M·K rows),
  *   - every emitted code is the true argmin sub-centroid (brute-force
  *     cross-check against the collected codebooks, ties to lowest cell),
  *   - packed `code` is exactly the little-endian 4-bit pack of c0..c3,
  *     so all codes live in [0, 2^(4M)).
  * Mirrors AnnSpec's structure (collected small-fixture cross-checks). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val M = VectorOps.PqSubspaces
  private val K = VectorOps.PqCodebookSize

  private def embeddings = {
    functions.GraftFunctions.register(spark)
    Tables.spread(spark, Tables.embeddings(spark, TestSpark.sf0001))
  }

  private def dimAndSub: (Int, Int) = {
    val dim = embeddings.select(size(col("embedding")).as("n"))
      .limit(1).collect()(0).getInt(0)
    assert(dim % M == 0, s"fixture dim $dim must divide into $M subspaces")
    (dim, dim / M)
  }

  private def collectBooks(subDim: Int): Map[(Int, Int), Seq[Float]] =
    VectorOps.trainPqCodebooks(spark, embeddings, subDim)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toSeq))
      .toMap

  test("codebooks are driver-small (exactly M*K rows) and deterministic " +
      "across two trainings (FLOAT-rounding convention)") {
    val (_, subDim) = dimAndSub
    val a = collectBooks(subDim)
    val b = collectBooks(subDim)
    // every (m, cell) present, subDim-wide — the driver-smallness contract:
    // M*K*subDim floats regardless of corpus size
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
      "cell) and `code` is the little-endian 4-bit pack of c0..c3") {
    val (_, subDim) = dimAndSub
    val books = collectBooks(subDim)
    val embs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val out = VectorOps.queries("q_embed_pq")(spark, TestSpark.sf0001)
      .collect()
    assert(out.length == embs.size, "one code row per corpus vector")
    out.foreach { r =>
      val (id, code) = (r.getLong(0), r.getLong(5))
      val cells = Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
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
      val packed = cells.zipWithIndex
        .map { case (c, m) => c.toLong << (4 * m) }.sum
      assert(code == packed, s"vec $id: code $code != packed $packed")
      assert(code >= 0 && code < (1L << (4 * M)),
        s"vec $id: code $code outside [0, 2^${4 * M})")
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
    // raw floats — the fixture's 4×4-bit geometry (16 bits/vector, a
    // 128× compression) is deliberately coarse, so the floor pins the
    // OBSERVED deterministic value (0.12; fixed seeds/rounds/fixture),
    // margin only for ordering ties — a silent regression in the lookup
    // table or the tie-break fails the spec
    val recall = brute.intersect(got).size.toDouble / brute.size
    info(s"adc recall@5 = $recall")
    assert(recall >= 0.12, s"adc recall@5 = $recall")
  }
}

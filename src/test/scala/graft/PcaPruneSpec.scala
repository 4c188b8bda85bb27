package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** Spectral embedding ops: q_embed_pca's power iteration must actually
  * converge to the top eigenpair (projection variance == Rayleigh
  * eigenvalue, class separation along a planted axis), and
  * q_prototype_prune's hardest-half keep must follow the analytic
  * geometry of hand-built prototypes. */
class PcaPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(rows: Seq[(Long, Int, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("pca: projection variance equals the Rayleigh eigenvalue") {
    // rank-1 spectrum + tiny orthogonal noise: if the unrolled power
    // iteration converged, the variance of the PC1 projection IS the
    // Rayleigh-quotient eigenvalue — a self-certifying convergence pin
    // (an unconverged direction projects strictly less variance).
    val dim = 8
    val u = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    val rows = (0 until 40).map { i =>
      val a = (i - 19.5) / 10.0           // spread along u
      val eps = ((i % 7) - 3) * 0.002     // tiny off-axis noise
      val v = Array.tabulate(dim)(k =>
        (a * u(k) + (if (k == 0) eps else -eps / (dim - 1))).toFloat)
      (i.toLong, 0, v.toSeq)
    }
    val r = VectorOps.pcaOf(spark, vecs(rows)).collect()
    assert(r.length === 1)
    val (varP, eig) = (r.head.getDouble(3), r.head.getDouble(4))
    assert(eig > 0.5, s"planted spectrum has O(1) top eigenvalue, got $eig")
    assert(math.abs(varP - eig) <= 2e-3,
      s"unconverged component: var_p $varP != eig $eig")
  }

  test("pca: classes separate along the planted principal axis") {
    // two classes at -u and +u: PC1 is u (also the power-iteration start,
    // so the sign is pinned positive) and the per-label projection means
    // must straddle zero at ~±1.
    val dim = 8
    val u = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    val rows = (0 until 60).map { i =>
      val c = if (i % 2 == 0) -1.0 else 1.0
      val jit = ((i % 5) - 2) * 0.01
      val v = Array.tabulate(dim)(k => ((c + jit) * u(k)).toFloat)
      (i.toLong, i % 2, v.toSeq)
    }
    val byLabel = VectorOps.pcaOf(spark, vecs(rows)).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(byLabel(0) < -0.5 && byLabel(1) > 0.5,
      s"PC1 projection must separate the classes, got $byLabel")
  }

  test("prune: hardest-half keep follows the planted angular geometry") {
    import spark.implicits._
    // prototypes = axis units; cluster members rotate away from their
    // prototype by strictly increasing angles as ids grow, so prototype
    // similarity strictly DECREASES with id: the hardest ceil(n/2) are
    // exactly the highest ids.
    def member(axis: Int, angleIdx: Int): Seq[Float] = {
      val th = 0.05 * (angleIdx + 1)
      val v = Array.fill(4)(0.0f)
      v(axis) = math.cos(th).toFloat
      v(3) = math.sin(th).toFloat      // off-axis leak, shared direction
      v.toSeq
    }
    val e = (0 until 4).map(i => (i.toLong, 0, member(0, i))) ++
      (10 until 15).map(i => (i.toLong, 1, member(1, i - 10)))
    val cent = Seq(
      (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("cell", "centroid")
    val rows = VectorOps.prototypePruneOf(spark, vecs(e), cent)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // cluster 0: n=4, keep 2 hardest = ids {3, 2}; hardest = 3
    assert(rows(0) === ((4L, 2L, 5L, 3L)), s"cell 0 got ${rows(0)}")
    // cluster 1: n=5, keep 3 hardest = ids {14, 13, 12}; hardest = 14
    assert(rows(1) === ((5L, 3L, 39L, 14L)), s"cell 1 got ${rows(1)}")
  }

  test("prune: registered schedule partitions the corpus and keeps halves") {
    val rows = VectorOps.queries("q_prototype_prune")(spark, TestSpark.sf0001)
      .collect()
    val total = rows.map(_.getLong(1)).sum
    val n = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet").count()
    assert(total === n, "every vector is assigned to exactly one prototype")
    rows.foreach { r =>
      val (nv, kept) = (r.getLong(1), r.getLong(2))
      assert(2 * kept - nv == 0L || 2 * kept - nv == 1L,
        s"cell ${r.getInt(0)}: kept $kept of $nv is not the hardest half")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** ANN behavior: the LSH path is approximate — assert its structure and its
  * recall against the brute-force baseline. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bruteSet: Set[(Long, Long)] =
    VectorOps.queries("q_ann_brute")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("lsh returns at most 5 ranked neighbors per query, ranks 1..k") {
    val rows = VectorOps.queries("q_ann_lsh")(spark, TestSpark.sf0001).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(2)).sorted
      assert(ranks.length <= 5)
      assert(ranks.toSeq == (1 to ranks.length))
    }
  }

  test("ivf returns ranked neighbors and achieves meaningful recall@5") {
    val brute = bruteSet
    val ivf = VectorOps.queries("q_ann_ivf")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    // Lloyd-trained cells (hash-sampled seeds, label column unused) track
    // the corpus's cluster structure: nearest neighbors should often share
    // the query's cell, so nprobe=2 recall is well above chance.
    // Deterministic (fixed seeds/rounds/fixture): observed 0.52 — the
    // floor sits at the observed value, margin only for ordering ties.
    // The same number is a driver-checked artifact via q_ann_recall's
    // DuckDB oracle, which replays the unrolled Lloyd loop.
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf recall@5 = $recall")
  }

  test("sq8 search recall@5 vs the float brute force") {
    // symmetric int8 quantization over a unit-normalized corpus: the
    // approximate dot tracks cosine closely, so the int-ranked top-5
    // should recover most of the float top-5. The floor is deliberately
    // conservative (quantization CAN reorder near-ties); the exact row
    // set is separately hash-pinned by the DuckDB oracle.
    val brute = bruteSet
    val sq8 = VectorOps.queries("q_ann_sq8")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq8.nonEmpty)
    val recall = brute.intersect(sq8).size.toDouble / brute.size
    info(s"sq8 recall@5 = $recall")
    assert(recall >= 0.8, s"sq8 recall@5 = $recall")
    spark.catalog.clearCache()
  }

  test("two-stage refine recall@5 floors at or above the pure-ADC index search") {
    // IVFADC+refine re-ranks the ADC short-list from exact floats: within
    // the SAME probed cells its recall can only meet or beat the pure-ADC
    // ranking (both are driver-checked artifacts; this pins the ordering
    // the refine stage exists to buy). Ceiling: exact IVF at the same
    // nprobe — refine cannot recover a neighbor whose cell was not probed.
    val brute = bruteSet
    def recallOf(name: String): Double = {
      val got = VectorOps.queries(name)(spark, TestSpark.sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty, s"$name returned nothing")
      brute.intersect(got).size.toDouble / brute.size
    }
    val adc = recallOf("q_ann_ivfpq_idx")
    val refined = recallOf("q_ann_ivfpq_refine")
    val exactIvf = recallOf("q_ann_ivf_idx")
    info(s"recall@5 adc=$adc refine=$refined exact-ivf=$exactIvf")
    assert(refined >= adc,
      s"refine recall $refined below pure ADC $adc")
    assert(refined <= exactIvf + 1e-9,
      s"refine recall $refined above its exact-IVF ceiling $exactIvf")
    // deterministic fixture: observed adc=0.08 → refine=0.36 (the
    // refineK=50 short-list bounds how much the re-rank can recover at
    // this tiny SF's weak codebooks; exact-IVF ceiling 0.76). The floor
    // sits just under the observed value — a silent refine regression
    // moves it, ties don't.
    assert(refined >= 0.3, s"refine recall@5 = $refined")
    spark.catalog.clearCache()
  }

  test("lsh recall@5 pinned at two widths (the scale dial has code behind it)") {
    val brute = bruteSet
    assert(brute.nonEmpty)
    // the width/probe dial SCALING.md describes: wider codes = smaller
    // buckets (cheaper exact scoring) at some recall cost; multi-probe
    // buys recall back. Deterministic planes + fixture => recall is
    // exact; floors pin the observed values themselves (0.18 / 0.14 /
    // 0.06), not a loose lower bound — a silent recall regression in the
    // signature or probe selection fails the spec. The default geometry
    // (8, 2) is additionally oracle-checked via q_ann_recall.
    for ((width, probes, minRecall) <- Seq(
        (6, 2, 0.18), (8, 2, 0.14), (10, 2, 0.06))) {
      val got = VectorOps.annLsh(spark, TestSpark.sf0001, width, probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = brute.intersect(got).size.toDouble / brute.size
      info(s"width=$width probes=$probes recall@5 = $recall")
      assert(recall >= minRecall,
        s"width=$width probes=$probes recall@5 = $recall < $minRecall")
    }
  }

  test("width schedule: integer-exact log2(n/target), clamped") {
    // the schedule the oracle's nw CTE mirrors; a drift here desyncs the
    // two engines, so the exact values are pinned
    assert(VectorOps.lshWidthFor(1) == 4)          // min clamp
    assert(VectorOps.lshWidthFor(50) == 4)
    assert(VectorOps.lshWidthFor(500) == 6)        // sf0.001/sf0.01 fixtures
    assert(VectorOps.lshWidthFor(512) == 6)        // 8*2^6 = 512 boundary
    assert(VectorOps.lshWidthFor(513) == 7)
    assert(VectorOps.lshWidthFor(2000) == 8)       // sf0.1 fixture
    assert(VectorOps.lshWidthFor(1_000_000_000L) == 24) // max clamp
    // cap: 64x expected occupancy, floored at 64x target occupancy
    assert(VectorOps.knnCapFor(500, 6) == 512)
    assert(VectorOps.knnCapFor(50, 4) == 512)
    // past the width clamp, occupancy grows with n and the cap follows
    assert(VectorOps.knnCapFor(1_000_000_000L, 24) ==
      64L * ((1_000_000_000L + (1L << 24) - 1) >> 24))
    // IVF cells: smallest c with c^2 * 50 >= n (sqrt growth), clamped —
    // the same integer predicate the oracle's nc CTE searches
    assert(VectorOps.ivfCellsFor(1) == 4)            // min clamp
    assert(VectorOps.ivfCellsFor(500) == 4)          // sf0.001/0.01 fixtures
    assert(VectorOps.ivfCellsFor(800) == 4)          // 4^2*50 boundary
    assert(VectorOps.ivfCellsFor(801) == 5)
    assert(VectorOps.ivfCellsFor(2000) == 7)         // sf0.1 fixture
    assert(VectorOps.ivfCellsFor(1_000_000_000L) == 4096) // max clamp
  }

  test("two fixture sizes pick two different widths, both with usable output") {
    // embeddings is 500 rows at both sf0.001 and sf0.01; sf0.1 has 2000 —
    // the smallest pair of fixtures whose counts cross a width boundary
    val sizes = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").map { d =>
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val w = VectorOps.lshWidthFor(n)
      val rows = VectorOps.annLsh(spark, d, w, VectorOps.LshProbes).collect()
      assert(rows.nonEmpty, s"$d width=$w produced no neighbors")
      (n, w)
    }
    info(s"schedule picked: $sizes")
    assert(sizes.map(_._2).distinct.length == 2,
      s"fixture sizes must exercise two widths, got $sizes")
  }

  test("knn join restricted to the fixed queries equals the pointwise LSH top-3") {
    // same buckets, same probes, every vector a query: slicing the join's
    // output to the 10 pointwise query ids and rank <= 3 must reproduce
    // annLsh's rows exactly — the join is the pointwise path generalized,
    // not a reimplementation that can drift. Width/cap come from the same
    // schedule the registered queries use.
    val n = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet").count()
    val w = VectorOps.lshWidthFor(n)
    val knn = VectorOps.knnJoin(spark, TestSpark.sf0001,
        w, VectorOps.LshProbes, 3, cap = VectorOps.knnCapFor(n, w))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .filter(_._1 < 10).toSet
    val pointwise = VectorOps.annLsh(spark, TestSpark.sf0001,
        w, VectorOps.LshProbes)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
      .filter(_._2 <= 3).toSet
    assert(knn == pointwise)
    assert(knn.nonEmpty)
  }

  test("hard negatives: different-label only, and exactly the kNN list with same-label rows dropped") {
    val d = TestSpark.sf0001
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    val w = VectorOps.lshWidthFor(n)
    val cap = VectorOps.knnCapFor(n, w)
    val labels = spark.read.parquet(s"$d/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val hn = VectorOps.hardNegatives(spark, d, w, VectorOps.LshProbes, 3, cap)
      .collect()
    assert(hn.nonEmpty)
    hn.foreach { r =>
      val (q, nb, nl) = (r.getLong(0), r.getLong(2), r.getInt(3))
      assert(labels(nb) == nl, s"neg_label drifted from the table for $nb")
      assert(labels(q) != nl, s"same-label negative leaked: $q -> $nb ($nl)")
    }
    hn.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length))
    }
    // equivalence to the unconstrained join: k=50 exhausts every bucket's
    // candidate list at this SF (occupancy ~8, probes+1 buckets), so the
    // hard-negative top-3 must be EXACTLY the first 3 different-label
    // entries of the kNN list in rank order — the label predicate prunes,
    // it cannot reorder
    val knnAll = VectorOps.knnJoin(spark, d, w, VectorOps.LshProbes, 50, cap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = knnAll.toSeq.flatMap { case (q, rs) =>
      rs.toSeq.sortBy(_._2).map(_._3).filter(nb => labels(nb) != labels(q))
        .take(3).zipWithIndex.map { case (nb, i) => (q, i + 1, nb) }
    }.toSet
    val got = hn.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected,
      s"hard-negative list is not the label-filtered kNN list: " +
        s"extra=${got.diff(expected).take(5)} missing=${expected.diff(got).take(5)}")
  }

  test("bucketed embed near-dup is sound, and recalls what its geometry promises") {
    val exact = VectorOps.queries("q_embed_neardup")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.queries("q_embed_neardup_lsh")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // soundness: every bucketed pair passes the same exact-cosine verify,
    // so lsh ⊆ exact always
    assert(lsh.subsetOf(exact), s"unsound pairs: ${lsh.diff(exact)}")
    // The corpus's "near-dups" at 0.45 are barely similar (max off-diag
    // cosine ~0.51 — random fixture, no true twins): at that angle a
    // 6-bit bucket keeps ~7% per direction, so low recall here is the
    // geometry, not a bug. Pin the observed deterministic value; the
    // planted-twin test below carries the real near-dup recall claim.
    val recall = lsh.size.toDouble / exact.size
    info(s"bucketed near-dup recall at 0.45 = $recall (${lsh.size}/${exact.size})")
    assert(recall >= 0.25, s"recall $recall")
  }

  test("bucketed embed near-dup finds every planted true twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 40 deterministic pseudo-random base vectors + 5 planted twins
    // (0.1% perturbation, cosine ~0.9999): TRUE near-dups, the case the
    // operator exists for — every planted pair must surface
    val dim = 16
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 7919) % 997).toFloat - 498f) / 498f)
    val base = (0 until 40).map(i => (i.toLong, vec(i.toLong), 0))
    val twins = (0 until 5).map { i =>
      val v = vec(i.toLong)
      v(0) = v(0) + 0.001f
      (100L + i, v, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-twins").toString
    (base ++ twins).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = 45L
    val w = VectorOps.lshWidthFor(n)
    val pairs = VectorOps.embedNeardupLsh(spark, dir, w, VectorOps.LshProbes,
        VectorOps.knnCapFor(n, w), threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(planted.subsetOf(pairs),
      s"missed planted twins: ${planted.diff(pairs)}")
  }

  test("semantic dedup cell schedule: integer-exact ceil(n/target), clamped") {
    // the linear twin of the IVF sqrt schedule — constant expected
    // occupancy; the oracle's nc CTE searches the same predicate
    assert(VectorOps.semCellsFor(1) == 4)            // min clamp
    assert(VectorOps.semCellsFor(200) == 4)          // 4*50 boundary
    assert(VectorOps.semCellsFor(201) == 5)
    assert(VectorOps.semCellsFor(500) == 10)         // sf0.001/0.01 fixtures
    assert(VectorOps.semCellsFor(5000) == 100)       // sf0.1 fixture
    assert(VectorOps.semCellsFor(1L << 40) == VectorOps.SemMaxCells)
  }

  test("semantic dedup: sound (every emitted pair is a real near-dup), keep-min, lower-id rep") {
    val d = TestSpark.sf0001
    val exact = VectorOps.queries("q_embed_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = VectorOps.queries("q_semantic_dedup")(spark, d).collect()
    assert(sem.nonEmpty)
    sem.foreach { r =>
      val (v, rep, nNear) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(rep < v, s"representative must be the lower id: $rep >= $v")
      // cell-scoping can only RESTRICT the pair relation: anything the
      // cell pairing emits must be in the exact all-pairs set
      assert(exact.contains((rep, v)),
        s"unsound: ($rep, $v) not a true >=0.45 pair")
      val exactLower = exact.count(_._2 == v)
      assert(nNear <= exactLower,
        s"n_near $nNear exceeds the $exactLower true lower-id partners of $v")
      // keep-min within what the cell retained: rep is a true partner and
      // no emitted row for v points above it (single row per v by groupBy)
    }
    info(s"semantic dedup flagged ${sem.length} duplicates " +
      s"of ${exact.size} exact near-dup pairs")
  }

  test("semantic dedup catches every planted true twin") {
    import spark.implicits._
    // same planted-twin fixture as the LSH near-dup test: cosine ~0.9999
    // twins MUST co-cluster (same nearest centroid) and be flagged with
    // their base vector as representative
    val dim = 16
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 7919) % 997).toFloat - 498f) / 498f)
    val base = (0 until 40).map(i => (i.toLong, vec(i.toLong), 0))
    val twins = (0 until 5).map { i =>
      val v = vec(i.toLong)
      v(0) = v(0) + 0.001f
      (100L + i, v, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-semtwins").toString
    (base ++ twins).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.semanticDedup(spark, dir,
        VectorOps.semCellsFor(45), VectorOps.SemCellCap, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until 5).foreach { i =>
      // rep <= base id: the base itself is a >=0.99 partner, and keep-min
      // may find an even lower-id one (these pseudo-random ramp vectors
      // are correlated enough that e.g. base 1 ~ base 0 at >=0.99)
      val rep = got.get(100L + i)
      assert(rep.isDefined, s"twin ${100 + i} not flagged as duplicate")
      assert(rep.get <= i.toLong,
        s"twin ${100 + i} deduped to ${rep.get}, above its base $i")
    }
  }

  test("cross-corpus embed dedup flags every incoming twin with its best corpus match") {
    import spark.implicits._
    // corpus = even ids (bases); incoming = odd ids, each a 0.1%
    // perturbation of its neighbor base — all ten twins must be flagged,
    // and the reported match must be the best-available corpus vector
    // (>= the planted base's own cosine)
    val dim = 16
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 7919) % 997).toFloat - 498f) / 498f)
    val corpus = (0 until 40).map(i => (2L * i, vec(i.toLong), 0))
    val twins = (0 until 10).map { i =>
      val v = vec(i.toLong)
      v(0) = v(0) + 0.001f
      (2L * i + 1, v, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-xtwins").toString
    (corpus ++ twins).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = 50L
    val w = VectorOps.lshWidthFor(n)
    val got = VectorOps.embedCrossDedup(spark, dir, w, VectorOps.LshProbes,
        VectorOps.knnCapFor(n, w), threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (dot, na, nb) = (0 until dim).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, x, y), j) => (d + a(j).toDouble * b(j), x + a(j).toDouble * a(j), y + b(j).toDouble * b(j))
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val baseVec = corpus.map { case (id, v, _) => id -> v }.toMap
    twins.foreach { case (tid, tv, _) =>
      val m = got.get(tid)
      assert(m.isDefined, s"incoming twin $tid not flagged against the corpus")
      // best-match contract: the reported corpus vector is at least as
      // close as the planted base (these ramp vectors have close bases,
      // so equal-or-better, not strictly-the-base, is the invariant)
      assert(cos(tv, baseVec(m.get)) >= cos(tv, baseVec(tid - 1)) - 1e-12,
        s"twin $tid matched ${m.get}, worse than its base ${tid - 1}")
    }
    // corpus-only and incoming-only sides never swap: every key is odd,
    // every match even
    got.foreach { case (v, m) =>
      assert(v % 2 == 1 && m % 2 == 0, s"parity contract violated: $v -> $m")
    }
  }

  test("semantic dedup cell cap bounds a flooded cell") {
    import spark.implicits._
    // 300 identical vectors collapse into one cell; cap 8 must bound the
    // pair join at C(8,2) emitted duplicates (7 flagged of the retained
    // 8) instead of 300² — flood members beyond the cap are simply not
    // paired (the documented recall-loss degradation)
    val dim = 8
    val docs = (0 until 300).map(i => (i.toLong, Array.fill(dim)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-semflood").toString
    docs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.semanticDedup(spark, dir,
        VectorOps.semCellsFor(300), cap = 8L, threshold = 0.99)
      .collect()
    // exactly the retained members minus their keep-min representative
    assert(got.length == 7, s"expected 7 capped duplicates, got ${got.length}")
    got.foreach(r => assert(r.getLong(2) <= 7,
      s"n_near ${r.getLong(2)} exceeds the cap-implied bound"))
  }

  test("knn join bucket cap bounds an embedding flood") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 300 identical embeddings = one bucket; cap 8 keeps candidates at
    // (probes+1)·cap per query instead of the 300²-ish flood
    val dim = 8
    val docs = (0 until 300).map(i => (i.toLong, Array.fill(dim)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-knnflood").toString
    docs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val res = VectorOps.knnJoin(spark, dir, VectorOps.lshWidthFor(300),
        VectorOps.LshProbes, 3, cap = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // neighbors may only come from the <= 8 retained bucket members
    assert(res.map(_._2).distinct.length <= 8,
      s"cap leaked: ${res.map(_._2).distinct.length} distinct neighbors")
    // every query still gets answers (identical vectors: any rep serves)
    assert(res.map(_._1).distinct.length == 300)
  }

  test("multi-probe never hurts: candidates at probes=2 superset probes=0 recall") {
    val brute = bruteSet
    def recallAt(probes: Int): Double = {
      val got = VectorOps.annLsh(spark, TestSpark.sf0001, 8, probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val r0 = recallAt(0)
    val r2 = recallAt(2)
    info(s"width=8 recall probes=0: $r0, probes=2: $r2")
    assert(r2 >= r0, "probing more buckets must not lose true neighbors")
  }

  test("hyperplane_sig runs inside whole-stage codegen") {
    val df = VectorOps.annLsh(spark, TestSpark.sf0001, 8, 2)
    df.collect() // finalize the adaptive plan so codegen spans are marked
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hyperplanesig"), "native expression missing from plan")
    // the corpus-side signature Project must sit inside a WholeStageCodegen
    // span (`*(n)` prefix), not fall back to interpreted eval; the FileScan
    // line also mentions the expression (pushed isnotnull), hence `exists`
    val sigProjects = plan.linesIterator
      .filter(l => l.contains("hyperplanesig") && l.contains("Project"))
    assert(sigProjects.exists(_.trim.stripPrefix("+- ").stripPrefix(":- ")
        .startsWith("*")),
      s"hyperplane_sig Project outside codegen:\n$plan")
  }
}

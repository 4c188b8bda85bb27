package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.operators.DedupOps

/** Near-dup sketches must agree with exact Jaccard — both on the corpus
  * and on a planted fixture with known duplicates. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(q: String, dir: String): Set[(Long, Long)] =
    DedupOps.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash == exact blocked jaccard on sf0.001") {
    val exact = pairs("q_ngram_jaccard", TestSpark.sf0001)
    val mh = pairs("q_text_minhash", TestSpark.sf0001)
    assert(exact.nonEmpty, "corpus has planted near-dups")
    assert(mh == exact)
  }

  test("simhash == exact blocked jaccard on sf0.001") {
    val exact = pairs("q_ngram_jaccard", TestSpark.sf0001)
    val sh = pairs("q_text_simhash", TestSpark.sf0001)
    assert(sh == exact)
  }

  test("df-cap engages under a boilerplate flood; the true pair survives") {
    import spark.implicits._
    // 1200 docs all share one templated footer -> its shingles have
    // df = 1200 > cap = max(1000, 0.5% · 1200) = 1000. Without the cap the
    // self-join would generate all C(1200,2) = 719400 pairs off the footer
    // alone; with it, pairing runs on content shingles only. Docs 0 and 1
    // are genuine near-dups (one word differs) and must still be found —
    // with Jaccard over their FULL shingle sets, footer included.
    val boiler = "this footer sentence repeats verbatim on every page of the corpus"
    val content = (0 until 40).map(i => s"w${i * 7 % 97}x$i").mkString(" ")
    val docs = (0 until 1200).map { i =>
      val text = i match {
        case 0 => s"$boiler $content"
        case 1 => s"$boiler ${content.replace("x20 ", "y20 ")}"
        case _ => s"$boiler " + (0 until 30).map(j => s"u${i}q$j").mkString(" ")
      }
      (i.toLong, text, "en", "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-flood").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = DedupOps.queries("q_ngram_jaccard")(spark, dir)
    val found = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((0L, 1L)), s"got $found")
    // prove the cap ENGAGED on this corpus: the hot footer hashes ride the
    // plan as an in-set filter (In below 10 values, InSet above)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"df-cap filter absent from plan:\n$plan")
  }

  test("sf0.001 is below the relative df-cap: capped == uncapped result") {
    // the production cap max(1000, 0.5% of docs) must be inert on corpora
    // without boilerplate floods — q_ngram_jaccard's oracle equivalence
    // (checked by the driver) plus this pin keep the cap honest
    assert(DedupOps.ngramDfCap(500) == 1000L)
    assert(DedupOps.ngramDfCap(1000000) == 5000L)
  }

  test("LSH bucket cap: flood candidates grow linearly; cluster stays connected") {
    // A mega-cluster of near-identical docs (shared 45-token base, 3
    // unique tail tokens each: pairwise J = 43/49 ≈ 0.88) floods the
    // (band, value) buckets of both LSH paths. With the width cap, hot
    // buckets degrade to star pairing, so candidates must grow ~linearly
    // in the flood size (quadratic would 4x when the flood doubles), and
    // the verified star must still connect the whole flood into one
    // component for downstream clustering.
    import spark.implicits._
    def corpus(flood: Int): String = {
      val base = (0 until 45).map(i => s"b${i * 3 % 31}n$i").mkString(" ")
      val docs = (0 until flood).map { i =>
        val text = s"$base fu$i fv$i fw$i"
        (i.toLong, text, "en", "src0", text.length.toLong)
      } ++ (0 until 30).map { i =>
        val text = (0 until 40).map(j => s"d${i}z$j").mkString(" ")
        ((flood + i).toLong, text, "en", "src1", text.length.toLong)
      }
      val dir = Files.createTempDirectory(s"graft-lshflood$flood").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val cap = 32L
    for (gen <- Seq[(org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame](
        (d, c) => DedupOps.minhashCandidates(spark, d, c),
        (d, c) => DedupOps.simhashCandidates(spark, d, c))) {
      val (small, large) = (300, 600)
      val docsS = DedupOps.docHashes(spark, corpus(small)).persist()
      val docsL = DedupOps.docHashes(spark, corpus(large)).persist()
      val nS = gen(docsS, cap).count()
      val nL = gen(docsL, cap).count()
      assert(nS >= small - 1, s"star must keep every flood doc paired: $nS")
      assert(nL.toDouble / nS <= 3.0,
        s"candidates super-linear under flood: $small->$nS, $large->$nL")
      // verified pairs connect the flood into one component (union-find)
      val pairs = DedupOps.verifyPairs(gen(docsS, cap), docsS)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val roots = (0L until small.toLong).map(find).distinct
      assert(roots.size == 1, s"flood split into ${roots.size} components")
      docsS.unpersist(); docsL.unpersist()
      spark.catalog.clearCache()
    }
  }

  test("cap is inert below the width threshold: capped == uncapped candidates") {
    // on the real corpus no (band, value) bucket approaches the default
    // cap, so the capped generators must emit exactly the uncapped pair
    // set — this plus the oracle equivalence keeps the cap honest
    val docs = DedupOps.docHashes(spark, TestSpark.sf0001).persist()
    for (gen <- Seq[(org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame](
        (d, c) => DedupOps.minhashCandidates(spark, d, c),
        (d, c) => DedupOps.simhashCandidates(spark, d, c))) {
      val capped = gen(docs, DedupOps.LshBucketCap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = gen(docs, Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped == uncapped)
    }
    docs.unpersist()
  }

  test("token cap bounds per-doc hash arrays; truncated docs still dedup") {
    // one 10 MB doc must not become a jumbo aggregation row: shingling
    // stops at DocTokenCap tokens, the doc is flagged, and near-dup
    // detection still works prefix-to-prefix (docs diverging only beyond
    // the budget compare as identical — the documented trade)
    import spark.implicits._
    val cap = DedupOps.DocTokenCap
    val base = (0 until cap + 500).map(i => s"t${i % 9973}x$i").mkString(" ")
    val nearDup = base.replace("x10 ", "y10 ") // differs INSIDE the prefix
    val tailDiff = base + " " +
      (0 until 50).map(i => s"tail$i").mkString(" ") // differs only BEYOND it
    val docs = Seq((0L, base), (1L, nearDup), (2L, tailDiff))
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-jumbo").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dh = DedupOps.docHashes(spark, dir).collect()
    assert(dh.length == 3)
    dh.foreach { r =>
      assert(r.getSeq[Long](1).size <= cap - 2, "hash array exceeds the cap")
      assert(r.getBoolean(3), "oversized doc not flagged truncated")
    }
    val found = pairs("q_text_minhash", dir)
    assert(found == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"got $found")
  }

  test("span-dup rate: shared verbatim run counted window-exact, others zero") {
    // docs 0 and 1 share a verbatim 25-token run (different surroundings,
    // far below doc-level J>=0.8) -> exactly 25-20+1 = 6 duplicated
    // windows each; doc 2 shares nothing
    import spark.implicits._
    val run = (0 until 25).map(i => s"shared$i").mkString(" ")
    val a = s"${(0 until 30).map(i => s"apre$i").mkString(" ")} $run"
    val b = s"$run ${(0 until 30).map(i => s"bpost$i").mkString(" ")}"
    val c = (0 until 60).map(i => s"cown$i").mkString(" ")
    val docs = Seq((0L, a), (1L, b), (2L, c))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-span").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupOps.queries("q_span_dup_rate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val spanWindows = 25 - DedupOps.SpanLen + 1
    assert(rows(0L) == (a.split(" ").length - DedupOps.SpanLen + 1, spanWindows))
    assert(rows(1L) == (b.split(" ").length - DedupOps.SpanLen + 1, spanWindows))
    assert(rows(2L)._2 == 0L)
  }

  test("span-trim: duplicated run cut from every doc, trimmed text md5-exact") {
    // docs 0/1 share a verbatim 25-token run (1 merged island each, 25
    // tokens cut); doc 3 IS the run (fully cut -> md5('')); doc 2 shares
    // nothing and must be absent (output is O(affected docs))
    import spark.implicits._
    val run = (0 until 25).map(i => s"shared$i").mkString(" ")
    val aPre = (0 until 30).map(i => s"apre$i").mkString(" ")
    val bPost = (0 until 30).map(i => s"bpost$i").mkString(" ")
    val docs = Seq((0L, s"$aPre $run"), (1L, s"$run $bPost"),
        (2L, (0 until 60).map(i => s"cown$i").mkString(" ")), (3L, run))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-spantrim").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = DedupOps.queries("q_span_trim")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rows.keySet == Set(0L, 1L, 3L))
    assert(rows(0L) == ((55L, 25L, 1L, md5(aPre))))
    assert(rows(1L) == ((55L, 25L, 1L, md5(bPost))))
    assert(rows(3L) == ((25L, 25L, 1L, md5(""))))
  }

  test("planted fixture: near-dup pair found, distinct docs not") {
    import spark.implicits._
    val base = (0 until 40).map(i => s"tok${i * 7 % 13} word$i item${i % 5}").mkString(" ")
    val nearDup = base.replace("word3 ", "changed3 ") // one token -> 3 shingles differ
    val other = (0 until 40).map(i => s"zeta${i * 11 % 17} gamma$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, other, "en", "src0", other.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-dedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val found = pairs("q_text_minhash", dir)
    assert(found == Set((0L, 1L)))
    val foundSim = pairs("q_text_simhash", dir)
    assert(foundSim == Set((0L, 1L)))
  }

  test("cross-dedup: incoming near-dup matched to its corpus twin only") {
    import spark.implicits._
    val base = (0 until 40).map(i => s"tok${i * 7 % 13} word$i item${i % 5}").mkString(" ")
    val nearDup = base.replace("word3 ", "changed3 ")
    val other = (0 until 40).map(i => s"zeta${i * 11 % 17} gamma$i").mkString(" ")
    // corpus = even ids {0, 2}; incoming = odd ids {1, 3}; only doc 1 has
    // a corpus twin (doc 0)
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, other, "en", "src0", other.length.toLong),
      (3L, "fully unrelated text tokens qqq www eee", "en", "src0", 40L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-cross").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupOps.queries("q_cross_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 0L)), s"got ${rows.toSeq}")
  }

  test("cross-dedup corpus-side cap: flooded bucket still answers via its rep") {
    import spark.implicits._
    // corpus = 60 near-identical docs (even ids 0..118); incoming doc 121
    // is a near-dup of the cluster. With cap = 10 the flooded corpus
    // buckets keep only their min-id representative — the incoming doc
    // must still be flagged, matched to a cluster member.
    val base = (0 until 45).map(i => s"base${i * 3 % 31} tk$i").mkString(" ")
    val corpus = (0 until 60).map { i =>
      val id = 2L * i
      val text = s"$base uniq${i}a uniq${i}b"
      (id, text, "en", "src0", text.length.toLong)
    }
    val incoming = Seq((121L, s"$base inc0a inc0b", "en", "src0", 100L))
    val docs = (corpus ++ incoming)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-crossflood").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val all = Tables.documents(spark, dir)
    val res = DedupOps.crossDedupBest(spark,
        all.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
        all.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        cap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.length == 1 && res.head._1 == 121L, s"got ${res.toSeq}")
    assert(res.head._2 % 2 == 0, "match must come from the corpus side")
  }

  test("cross-modal cluster equals a local union-find over the union pair graph") {
    // independent replay: collect both modalities' verified pair sets
    // (each already oracle-checked on its own), run a plain union-find,
    // and compare the labeled clusters row for row
    import graft.operators.VectorOps
    val d = TestSpark.sf0001
    val text = DedupOps.nearDupPairs(spark, d).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables.embeddings(spark, d).count()
    val w = VectorOps.lshWidthFor(n)
    val emb = VectorOps.embedNeardupLsh(spark, d, w, VectorOps.LshProbes,
        VectorOps.knnCapFor(n, w), 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(text.nonEmpty && emb.nonEmpty, "a modality's pair set is empty - vacuous")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    (text ++ emb).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    val expected = members.map { case (_, ms) =>
      val label = ms.min
      (label, ms.size.toLong, ms.map(_ - label).sum)
    }.toSet
    val got = SparkEntry.queries("q_cross_modal_cluster")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
    // the union must be doing cross-modal WORK on this fixture: at least
    // one cluster merges an edge only text found with one only the
    // embedding leg found (otherwise the operator is vacuously a copy of
    // one modality)
    val textSet = text.toSet; val embSet = emb.toSet
    val crossMerged = members.values.exists { ms =>
      val mset = ms.toSet
      def hasExclusive(ps: Set[(Long, Long)], other: Set[(Long, Long)]) =
        ps.exists(p => mset(p._1) && mset(p._2) && !other(p))
      hasExclusive(textSet, embSet) && hasExclusive(embSet, textSet)
    }
    assert(crossMerged,
      "no cluster joins a text-only edge with an embedding-only edge")
    spark.catalog.clearCache()
  }

  test("keep-best: longest cluster member kept, singletons absent") {
    import spark.implicits._
    val base = (0 until 40).map(i => s"tok${i * 7 % 13} word$i item${i % 5}").mkString(" ")
    val nearDup = base.replace("word3 ", "changed3 ")
    val longer = base + " extra trailing tokens here"
    val other = (0 until 40).map(i => s"zeta${i * 11 % 17} gamma$i").mkString(" ")
    // cluster {0,1,2}: doc 2 is the longest (n_chars) and must win; doc 3
    // has no near-dup and must not appear in the output at all
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, longer, "en", "src0", longer.length.toLong),
      (3L, other, "en", "src0", other.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-keepbest").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupOps.queries("q_dedup_keep_best")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L), s"got ${rows.toSeq}")
    assert(rows.forall(r => r._2 == 0L && r._3 == 3L)) // rep = min id, size 3
    assert(rows.collect { case (id, _, _, 1) => id }.toSeq == Seq(2L),
      "keep flag must mark exactly the longest member")
  }

  test("leakage-safe split: near-dup pairs never straddle splits; singletons self-represent") {
    val d = TestSpark.sf0001
    val rows = SparkEntry.queries("q_split_leakage")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val split = rows.map(r => r._1 -> r._3).toMap
    val rep = rows.map(r => r._1 -> r._2).toMap
    // total coverage: one decision per corpus doc
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length.toLong == nDocs)
    // the leakage property itself: every EXACT verified near-dup pair
    // shares a representative, hence a split
    val dupPairs = pairs("q_ngram_jaccard", d)
    assert(dupPairs.nonEmpty, "corpus has planted near-dups")
    for ((a, b) <- dupPairs) {
      assert(rep(a) == rep(b), s"pair ($a, $b) has different reps")
      assert(split(a) == split(b), s"near-dups ($a, $b) straddle splits: " +
        s"${split(a)} vs ${split(b)} - eval leakage")
    }
    // docs outside every cluster represent themselves
    val inPairs = dupPairs.flatMap(p => Seq(p._1, p._2))
    for ((id, r, _) <- rows if !inPairs.contains(id))
      assert(r == id, s"singleton $id got foreign rep $r")
    // all three splits materialize and train dominates (8/1/1 hash split)
    val byShare = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byShare.keySet == Set("train", "val", "test"), s"got $byShare")
    assert(byShare("train") > byShare("val") && byShare("train") > byShare("test"))
  }

  test("a precomputed simhash signature must match the banding geometry or fail loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    graft.functions.GraftFunctions.register(spark)
    val base = (0 until 40).map(i => s"tok${i * 7 % 13} word$i item${i % 5}").mkString(" ")
    val nearDup = base.replace("word3 ", "changed3 ")
    val docs = Seq((0L, base), (1L, nearDup)).toDF("doc_id", "text")
    // a 9-word (576-bit) signature against the default 8-word geometry:
    // silently banding only the first 8 words was the ADVICE hazard — the
    // width guard must throw instead
    val wide = DedupOps.docHashesOf(spark, docs)
      .withColumn("sig", expr("simhash_sig(hs, 9)"))
    val e = intercept[Throwable] {
      DedupOps.simhashCandidates(spark, wide).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("simhash signature width"),
      s"guard did not fire; got: $chain")
    // the same signature with the geometry passed explicitly works
    val found = DedupOps.simhashCandidates(spark, wide, nWords = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((0L, 1L)), s"got $found")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Algebraic properties the shuffle contract guarantees (SURVEY.md §5c):
  * partial+final == direct, permutation invariance, dedup idempotence.
  * Driven by plain scalacheck (no scalatestplus bridge in the offline deps). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rowsGen =
    Gen.listOfN(200, Gen.zip(Gen.choose(0, 9), Gen.choose(-1000L, 1000L)))

  private def check(name: String, prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("SimHash64 matches a Scala reference model on random hash arrays") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def model(hs: List[Long]): Long = {
      var sim = 0L
      for (j <- 0 until 64) {
        val ones = hs.count(h => ((h >>> j) & 1L) == 1L)
        if (2 * ones > hs.length) sim |= (1L << j)
      }
      sim
    }
    val arrGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check("simhash-model", Prop.forAll(Gen.listOfN(20, arrGen)) { arrays =>
      val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "hs")
      val got = df.selectExpr("id", "simhash64(hs)").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      arrays.zipWithIndex.forall { case (a, i) => got(i.toLong) == model(a) }
    }, n = 5)
  }

  test("VectorAvg matches a Scala reference mean on random vectors") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 6
    val vecGen = Gen.listOfN(dim, Gen.choose(-1e6, 1e6))
    val grpGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), vecGen))
    check("vectoravg-model", Prop.forAll(grpGen) { rows =>
      val df = rows.map { case (k, v) => (k, v.toArray) }.toDF("k", "v")
      val got = df.groupBy("k").agg(expr("vector_avg(v)").as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      rows.groupBy(_._1).forall { case (k, vs) =>
        val n = vs.size
        (0 until dim).forall { j =>
          val want = vs.map(_._2(j)).sum / n
          math.abs(got(k)(j) - want) <= math.max(1e-9, math.abs(want) * 1e-9)
        }
      }
    }, n = 5)
  }

  test("FeatureHashVec is additive over token concatenation and order-invariant") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val tokGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12)))
    def vec(toks: List[String]): Seq[Long] =
      Seq((1L, toks)).toDF("id", "toks")
        .selectExpr(s"feature_hash_vec(toks, ${graft.operators.TextOps.FeatureHashDim})")
        .head().getSeq[Long](0)
    check("feature-hash-additive", Prop.forAll(Gen.zip(tokGen, tokGen)) {
      case (a, b) =>
        val (va, vb, vab) = (vec(a), vec(b), vec(a ++ b))
        // bag semantics: weights add under concatenation, so any
        // reordering (a++b vs b++a) yields the same vector
        vab == va.zip(vb).map { case (x, y) => x + y } && vec(b ++ a) == vab
    }, n = 6)
  }

  test("agg is invariant to partitioning (partial+final == direct)") {
    import spark.implicits._
    check("partition-invariance", Prop.forAll(rowsGen, Gen.choose(1, 13)) {
      (rows, nPart) =>
        val df = rows.toDF("k", "v")
        val direct = df.groupBy("k").agg(sum("v"), count(lit(1)))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        val repart = df.repartition(nPart).groupBy("k").agg(sum("v"), count(lit(1)))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        direct == repart
    })
  }

  test("agg is invariant to row order (permutation invariance)") {
    import spark.implicits._
    check("permutation-invariance", Prop.forAll(rowsGen) { rows =>
      val a = rows.toDF("k", "v").groupBy("k").agg(sum("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val b = scala.util.Random.shuffle(rows).toDF("k", "v").groupBy("k").agg(sum("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      a == b
    }, n = 5)
  }

  test("join algebra: semi = project of inner, anti = complement of semi") {
    import spark.implicits._
    check("join-algebra", Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val left = l.toDF("k", "v")
      val right = r.map(_._1).distinct.toDF("k")
      val semi = left.join(right, Seq("k"), "left_semi")
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val innerProj = left.join(right, Seq("k"))
        .select("k", "v").collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val anti = left.join(right, Seq("k"), "left_anti")
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val all = left.collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      semi == innerProj && (semi ++ anti) == all && semi.intersect(anti).isEmpty
    }, n = 5)
  }

  test("int8 quantization stays inside [-127, 127] and zeros degenerate vectors") {
    import spark.implicits._
    val vecGen = Gen.oneOf(
      Gen.listOfN(8, Gen.choose(-1000.0f, 1000.0f)),
      Gen.const(List.fill(8)(0.0f))) // amax = 0 guard path
    check("quantize-bounds", Prop.forAll(Gen.listOfN(30, vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("graft-q").toString
      df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val rows = graft.operators.VectorOps.queries("q_embed_quantize")(spark, dir)
        .collect()
      rows.forall { r =>
        val (mn, mx) = (r.getInt(2), r.getInt(3))
        mn >= -127 && mx <= 127
      } && rows.length == vecs.length
    }, n = 4)
  }

  test("lm score is non-positive (token probabilities never exceed 1)") {
    val rows = graft.operators.PipelineOps.queries("q_lm_score")(
      spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) <= 0.0))
  }

  test("dropDuplicates is idempotent and equals distinct on full rows") {
    import spark.implicits._
    check("dedup-idempotence", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = df.dropDuplicates("k", "v")
      once.count() == once.dropDuplicates("k", "v").count() &&
        once.count() == df.distinct().count()
    }, n = 5)
  }
  test("span-dup rate is a well-formed ratio; tfidf ranks are dense and ordered") {
    // corpus-level invariants on the two round-6 text operators
    val spans = graft.operators.DedupOps.queries("q_span_dup_rate")(
      spark, TestSpark.sf0001).collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      val (n, dup, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && dup >= 0 && dup <= n, s"span counts broken: $r")
      assert(rate >= 0.0 && rate <= 1.0, s"rate out of range: $r")
    }
    val tfidf = graft.operators.TextOps.queries("q_tfidf_topk")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    tfidf.groupBy(_._1).foreach { case (doc, rows) =>
      val rks = rows.map(_._2).sorted.toSeq
      assert(rks == (1 to rks.max), s"ranks not dense for doc $doc: $rks")
      // scores non-increasing in rank; equal scores ordered by term
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"rank order broken for doc $doc: $a then $b")
        case _ =>
      }
    }
  }

  test("Bpe.encode: lossless concat, count bounds, idempotent merges (property)") {
    import graft.functions.Bpe
    val wordGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    check("bpe-props", Prop.forAll(wordGen) { w =>
      val toks = Bpe.encode(w)
      // subword boundaries never lose or reorder characters
      toks.mkString == w &&
        // between "every merge fired" and "no merge fired"
        toks.length >= 1 && toks.length <= w.length &&
        // fixpoint: re-encoding each emitted token changes nothing
        toks.forall(t => Bpe.encode(t) == Vector(t))
    }, n = 200)
  }

  test("WAV codec roundtrips ARBITRARY PCM16 sample arrays bit-exactly (property)") {
    // the lossless-ness claim every audio oracle rests on, proven beyond
    // the fixture formulas: any sample array (including extremes and
    // empty-adjacent sizes) survives encode -> container parse unchanged
    import graft.operators.AudioOps
    val samplesGen = for {
      n <- Gen.choose(1, 600)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt),
        Gen.oneOf(0, 1, -1, Short.MaxValue.toInt, Short.MinValue.toInt)))
    } yield xs.map(_.toShort).toArray
    check("wav-roundtrip", Prop.forAll(samplesGen) { v =>
      val (rate, ch, out) = AudioOps.decodeWav(AudioOps.encodeWav(v))
      rate == AudioOps.SampleRate && ch == 1 && out.sameElements(v)
    }, n = 100)
  }

  test("audio fingerprint is invariant to silence-free amplitude sign flips only in energy ties") {
    // fingerprint bits depend only on frame-energy ORDER: negating every
    // sample preserves |v| and so the fingerprint, for any clip
    import graft.operators.AudioOps
    val samplesGen = Gen.choose(2, 12).flatMap(nf =>
      Gen.listOfN(nf * AudioOps.FpFrameLen,
        Gen.choose(-32767, 32767)).map(_.map(_.toShort).toArray))
    check("fp-neg-invariant", Prop.forAll(samplesGen) { v =>
      AudioOps.fingerprint(v) == AudioOps.fingerprint(v.map(x => (-x).toShort))
    }, n = 100)
  }
}

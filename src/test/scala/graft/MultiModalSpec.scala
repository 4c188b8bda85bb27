package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultiModalOps

/** Image-path codec: the generator must emit genuine PNG byte streams and
  * the ImageIO decode must roundtrip the grayscale samples exactly (PNG is
  * lossless), so the oracle can recompute pixel stats from doc_id alone. */
class MultiModalSpec extends AnyFunSuite {
  private val ids = Seq(0L, 1L, 7L, 23L, 499L, 12345L)

  test("encodePng produces real PNG byte streams (magic header)") {
    for (id <- ids) {
      val b = MultiModalOps.encodePng(id)
      assert(b.length > 8, s"id=$id payload too short")
      val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      assert(b.take(8).sameElements(magic), s"id=$id not a PNG stream")
    }
  }

  test("decode roundtrips dimensions and pixel stats sample-exactly") {
    for (id <- ids) {
      val (rid, w, h, nPx, mean, mn, mx) =
        MultiModalOps.decodePng(id, MultiModalOps.encodePng(id))
      assert(rid == id)
      assert(w == MultiModalOps.imgWidth(id))
      assert(h == MultiModalOps.imgHeight(id))
      assert(nPx == w * h)
      // brute-force the generator formula and compare every stat
      val px = for {
        y <- 0 until h.toInt
        x <- 0 until w.toInt
      } yield MultiModalOps.imgPixel(id, x, y)
      assert(mn == px.min.toLong, s"id=$id min")
      assert(mx == px.max.toLong, s"id=$id max")
      assert(mean == px.map(_.toLong).sum.toDouble / nPx, s"id=$id mean")
    }
  }

  test("2x2 average-pool matches brute-force pooling of the formula") {
    for (id <- ids) {
      val (_, w2, h2, n2, mean2, mn2, mx2, sum2) =
        MultiModalOps.poolPng(id, MultiModalOps.encodePng(id))
      val w = MultiModalOps.imgWidth(id)
      val h = MultiModalOps.imgHeight(id)
      assert(w2 == w / 2 && h2 == h / 2 && n2 == w2 * h2)
      val pooled = for {
        y <- 0 until h2.toInt
        x <- 0 until w2.toInt
      } yield (MultiModalOps.imgPixel(id, 2 * x, 2 * y) +
        MultiModalOps.imgPixel(id, 2 * x + 1, 2 * y) +
        MultiModalOps.imgPixel(id, 2 * x, 2 * y + 1) +
        MultiModalOps.imgPixel(id, 2 * x + 1, 2 * y + 1)) / 4
      assert(sum2 == pooled.map(_.toLong).sum, s"id=$id sum")
      assert(mn2 == pooled.min.toLong && mx2 == pooled.max.toLong, s"id=$id minmax")
      assert(mean2 == pooled.map(_.toLong).sum.toDouble / n2, s"id=$id mean")
    }
  }

  private def formulaDhash(id: Long): Long = {
    val w = MultiModalOps.imgWidth(id)
    val h = MultiModalOps.imgHeight(id)
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val y = j * h / 8
      if (MultiModalOps.imgPixel(id, (i + 1) * w / 9, y) >
          MultiModalOps.imgPixel(id, i * w / 9, y))
        hash |= 1L << (j * 8 + i)
    }
    hash
  }

  test("dhashPng over decoded PNG bytes matches the generator-formula dHash") {
    for (id <- ids)
      assert(MultiModalOps.dhashPng(MultiModalOps.encodePng(id)) == formulaDhash(id),
        s"id=$id")
  }

  test("q_image_dhash equals brute-force perceptual grouping of the corpus") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.01" // sf0.001's id range holds no collisions
    val docIds = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docIds.map(id => id -> formulaDhash(id))
      .groupBy(_._2).filter(_._2.length >= 2).toSeq
      .flatMap { case (dh, members) =>
        val ms = members.map(_._1).toSeq
        ms.map(id => (id, dh, ms.length.toLong, ms.min))
      }.toSet
    assert(expected.nonEmpty, "fixture holds no perceptual dups - test is vacuous")
    val got = MultiModalOps.queries("q_image_dhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q_image_neardup: banded join equals all-pairs hamming<=3 over distinct sigs") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.01"
    val docIds = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val byHash = docIds.map(id => id -> formulaDhash(id)).groupBy(_._2)
      .map { case (dh, ms) => dh -> ((ms.length.toLong, ms.map(_._1).min)) }
    val sigs = byHash.keys.toSeq.sorted
    val expected = (for {
      ai <- sigs.indices; bi <- (ai + 1) until sigs.length
      a = sigs(ai); b = sigs(bi)
      if java.lang.Long.bitCount(a ^ b) <= 3
    } yield (a, b, java.lang.Long.bitCount(a ^ b).toLong,
        byHash(a)._1, byHash(b)._1, byHash(a)._2, byHash(b)._2)).toSet
    assert(expected.nonEmpty, "fixture holds no near-dup signatures - test is vacuous")
    val got = MultiModalOps.queries("q_image_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(got.forall { case (_, _, hm, _, _, _, _) => hm >= 1 && hm <= 3 })
  }

  test("encodeGif produces a real multi-frame GIF; sampled decode is formula-exact") {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    for (id <- ids) {
      val bytes = MultiModalOps.encodeGif(id)
      // magic header: GIF87a/GIF89a
      assert(new String(bytes.take(3), "US-ASCII") == "GIF", s"id=$id not a GIF")
      // step=1: EVERY frame roundtrips the generator formula exactly
      val all = MultiModalOps.decodeGifFrames(id, bytes, 1, reader)
      assert(all.length == MultiModalOps.vidFrames(id), s"id=$id frame count")
      for ((row, f) <- all.zipWithIndex) {
        val (rid, fi, nf, w, h, nPx, mean, mn, mx) = row
        assert(rid == id && fi == f && nf == MultiModalOps.vidFrames(id))
        assert(w == MultiModalOps.vidWidth(id) && h == MultiModalOps.vidHeight(id))
        val px = for {
          y <- 0 until h.toInt
          x <- 0 until w.toInt
        } yield MultiModalOps.vidPixel(id, f, x, y)
        assert(nPx == px.length.toLong, s"id=$id f=$f n_px")
        assert(mn == px.min.toLong && mx == px.max.toLong, s"id=$id f=$f minmax")
        assert(mean == px.map(_.toLong).sum.toDouble / nPx, s"id=$id f=$f mean")
      }
      // step=2: the sampled set is exactly frames 0, 2, 4, ...
      val sampled = MultiModalOps.decodeGifFrames(id, bytes, 2, reader)
      assert(sampled.map(_._2) == all.map(_._2).filter(_ % 2 == 0), s"id=$id sampling")
    }
  }

  test("q_multimodal_meta decodes real bytes end-to-end at sf0.001") {
    val spark = TestSpark.spark
    val rows = MultiModalOps.queries("q_multimodal_meta")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.length > 0)
    for (r <- rows.take(20)) {
      val id = r.getLong(0)
      assert(r.getLong(1) == MultiModalOps.imgWidth(id))
      assert(r.getLong(2) == MultiModalOps.imgHeight(id))
    }
  }

  test("q_multimodal_pipeline mix report agrees with the standalone dedup families") {
    // the pipeline's per-modality dup verdicts must be EXACTLY the three
    // standalone queries' group rule (>=2 group, not the min-doc keeper):
    // flag-marginal doc counts equal each family's non-keeper member
    // count, the report partitions the corpus, and keep <=> no flag set
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val rep = SparkEntry.queries("q_multimodal_pipeline")(spark, d).collect()
    assert(rep.nonEmpty)
    val total = Tables.documents(spark, d).count()
    assert(rep.map(_.getLong(4)).sum == total, "mix report must partition the corpus")
    def nonKeepers(q: String) = SparkEntry.queries(q)(spark, d)
      .filter(col("doc_id") =!= col("rep_id")).count()
    def flagged(i: Int) = rep.filter(_.getLong(i) == 1L).map(_.getLong(4)).sum
    assert(flagged(0) == nonKeepers("q_image_dhash"), "img_dup marginal")
    assert(flagged(1) == nonKeepers("q_audio_fingerprint"), "aud_dup marginal")
    assert(flagged(2) == nonKeepers("q_video_fingerprint"), "vid_dup marginal")
    rep.foreach { r =>
      assert((r.getLong(3) == 1L) ==
        (r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L),
        s"keep flag inconsistent in $r")
    }
    spark.catalog.clearCache()
  }
}

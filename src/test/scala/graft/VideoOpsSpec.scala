package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VideoOps

/** The MP4 writer must emit structurally valid ISO-BMFF (sizes tile the
  * file exactly, mandatory boxes present in order) and the parser/demuxer
  * must recover every field and every sample byte range exactly — the
  * lossless-container contract the PNG/WAV paths carry, applied to the
  * box layer (the sample payload itself is the declared FFI seam). */
class VideoOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ids = Seq(0L, 1L, 7L, 23L, 96L, 499L, 12345L)

  test("encodeMp4 emits a structurally valid [ftyp][mdat][moov] box tree") {
    for (id <- ids) {
      val b = VideoOps.encodeMp4(id)
      val top = VideoOps.boxes(b, 0, b.length)
      assert(top.map(_._1) == List("ftyp", "mdat", "moov"), s"id=$id top boxes")
      // box sizes tile the file exactly (boxes() requires it; also check
      // the last payload ends at EOF)
      assert(top.last._3 == b.length)
      // the mdat payload is exactly the sum of the declared sample sizes
      val mdat = top(1)
      val expected = (0 until VideoOps.nSamples(id))
        .map(f => VideoOps.sampleSize(id, f)).sum
      assert(mdat._3 - mdat._2 == expected, s"id=$id mdat size")
    }
  }

  test("parseMeta recovers every container field from the real boxes") {
    for (id <- ids) {
      val (brand, ts, dur, w, h, n, handler, codec) =
        VideoOps.parseMeta(VideoOps.encodeMp4(id))
      assert(brand == "isom" && ts == VideoOps.Timescale)
      assert(dur == VideoOps.nSamples(id).toLong * VideoOps.sampleDur(id))
      assert(w == VideoOps.vidWidth(id) && h == VideoOps.vidHeight(id))
      assert(n == VideoOps.nSamples(id))
      assert(handler == "vide" && codec == "grft")
    }
  }

  test("demux recovers every sample's byte slice exactly via stco + stsz") {
    for (id <- ids) {
      val samples = VideoOps.demux(VideoOps.encodeMp4(id))
      assert(samples.length == VideoOps.nSamples(id))
      samples.foreach { case (f, slice) =>
        assert(slice.toSeq == VideoOps.sampleBytes(id, f).toSeq,
          s"id=$id sample $f bytes")
      }
    }
  }

  test("randomized geometry fuzz: write->parse->demux roundtrips byte-exactly") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(30)
      val dur = 1 + rnd.nextInt(1000)
      val w = 1 + rnd.nextInt(4096)
      val h = 1 + rnd.nextInt(4096)
      val payloads = Array.fill(n)(
        Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
      val b = VideoOps.encodeMp4From(n, dur, w, h, f => payloads(f))
      val (brand, ts, d2, pw, ph, pn, handler, codec) = VideoOps.parseMeta(b)
      assert(brand == "isom" && ts == VideoOps.Timescale)
      assert(d2 == n.toLong * dur && pw == w && ph == h && pn == n)
      assert(handler == "vide" && codec == "grft")
      val samples = VideoOps.demux(b)
      assert(samples.length == n)
      samples.foreach { case (f, sl) =>
        assert(sl.toSeq == payloads(f).toSeq, s"sample $f of n=$n")
      }
    }
  }

  test("a foreign parser seam: corrupted size field fails loudly, not silently") {
    val b = VideoOps.encodeMp4(5L)
    b(0) = 0x7f.toByte // blow up the ftyp size
    intercept[IllegalArgumentException] { VideoOps.boxes(b, 0, b.length) }
  }

  test("fingerprint is a pure function of the content key and encodes sum deltas") {
    for (cid <- Seq(0L, 1L, 13L, 47L)) {
      val (fp1, n1) = VideoOps.fingerprint(VideoOps.demux(VideoOps.encodeFpMp4(cid)))
      val (fp2, n2) = VideoOps.fingerprint(VideoOps.demux(VideoOps.encodeFpMp4(cid)))
      assert(fp1 == fp2 && n1 == n2 && n1 == VideoOps.fpN(cid))
      // independent replay of the bit law from the byte formula
      val sums = (0 until VideoOps.fpN(cid)).map(f =>
        (0 until VideoOps.fpSize(cid, f)).map(k => VideoOps.fpByte(cid, f, k).toLong).sum)
      var exp = 0L
      for (f <- 0 until sums.length - 1) if (sums(f + 1) > sums(f)) exp |= 1L << f
      assert(fp1 == exp, s"cid=$cid")
    }
  }

  test("queries run end-to-end on sf0.001 with coherent schemas") {
    val meta = VideoOps.queries("q_video_meta")(spark, TestSpark.sf0001).collect()
    assert(meta.length > 0)
    meta.foreach { r =>
      assert(r.getString(1) == "isom" && r.getString(7) == "vide")
      assert(r.getLong(3) == r.getLong(4) * (40 + (r.getLong(0) % 5) * 10))
    }
    val demux = VideoOps.queries("q_video_demux")(spark, TestSpark.sf0001).collect()
    assert(demux.length > 0)
    demux.foreach { r =>
      assert(r.getLong(1) % 2 == 0) // every 2nd sample
      assert(r.getLong(3) >= 32 && r.getLong(3) < 64)
      assert(r.getLong(4) >= 0 && r.getLong(5) < 256 && r.getLong(6) < 256)
    }
    spark.catalog.clearCache()
  }
}

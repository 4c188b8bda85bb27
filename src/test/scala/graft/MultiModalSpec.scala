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
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.VideoOps
import graft.streaming.VideoDedupStream

/** Top-level so Spark can build its encoder without an outer scope. */
case class VideoEv(doc_id: Long, payload: Array[Byte], ts: java.sql.Timestamp)

/** Streaming video dedup must agree with the batch fingerprint grouping
  * when the whole corpus streams against its own index — the online/batch
  * parity contract the text, embedding, image and audio twins carry. */
class VideoDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("whole corpus streamed against its own index equals batch groups") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val d = TestSpark.sf0001
    val docIds = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    // expected via the demux path itself (byte-exact, spec'd in
    // VideoOpsSpec): every arrival matches exactly its fingerprint group
    val fpOf = docIds.map { id =>
      id -> VideoOps.fingerprint(
        VideoOps.demux(VideoOps.encodeFpMp4(VideoOps.fpCid(id))))._1
    }.toMap
    val nOf = fpOf.values.groupBy(identity).map { case (fp, g) => fp -> g.size.toLong }
    val repOf = fpOf.toSeq.groupBy(_._2).map { case (fp, ms) => fp -> ms.map(_._1).min }
    val expected = docIds.map(id =>
      (id, fpOf(id), nOf(fpOf(id)), repOf(fpOf(id)))).toSet
    assert(expected.exists(_._3 > 1), "fixture holds no dup groups - vacuous")

    val idx = VideoOps.fingerprintIndex(spark, d)
    val evs = docIds.map(id => VideoEv(id,
      VideoOps.encodeFpMp4(VideoOps.fpCid(id)),
      new java.sql.Timestamp(1700000000000L + id)))
    val source = MemoryStream[VideoEv]
    val q = VideoDedupStream.matchesAgainstIndex(spark, source.toDF(), idx)
      .writeStream.format("memory").queryName("video_dedup")
      .outputMode("append").start()
    try {
      evs.grouped(evs.length / 3 + 1).foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql(
          "SELECT in_id, fp, corpus_n, corpus_rep FROM video_dedup")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(streamed.length == streamed.distinct.length,
        "an arrival matched its group twice despite exact-equality join")
      assert(streamed.toSet == expected,
        s"missing: ${expected.diff(streamed.toSet).take(3)}; " +
          s"extra: ${streamed.toSet.diff(expected).take(3)}")
    } finally q.stop()
  }

  test("foreachBatch pruned probe over the published index equals the lazy join") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val d = TestSpark.sf0001
    val docIds = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val evs = docIds.map(id => VideoEv(id,
      VideoOps.encodeFpMp4(VideoOps.fpCid(id)),
      new java.sql.Timestamp(1700000000000L + id)))
    val idx = VideoOps.fingerprintIndex(spark, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fpidx-video").toString
    graft.sources.FingerprintIndex.publishGroups(spark, idx, dir)

    def viaLazy: Set[(Long, Long, Long, Long)] = {
      val source = MemoryStream[VideoEv]
      val q = VideoDedupStream.matchesAgainstIndex(spark, source.toDF(), idx)
        .writeStream.format("memory").queryName("video_feb_lazy")
        .outputMode("append").start()
      try {
        source.addData(evs.toIndexedSeq: _*)
        q.processAllAvailable()
        spark.sql("SELECT in_id, fp, corpus_n, corpus_rep FROM video_feb_lazy")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      } finally q.stop()
    }
    val lazySet = viaLazy
    val buf = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val source = MemoryStream[VideoEv]
    val q = source.toDF().writeStream
      .foreachBatch(VideoDedupStream.foreachBatchProbe(spark, dir) { out =>
        buf.synchronized {
          buf ++= out.collect().map(r => (r.getAs[Long]("in_id"),
            r.getAs[Long]("fp"), r.getAs[Long]("corpus_n"),
            r.getAs[Long]("corpus_rep")))
        }
      })
      .start()
    try {
      evs.grouped(evs.length / 3 + 1).foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(buf.nonEmpty && buf.toSet == lazySet,
      s"missing=${lazySet.diff(buf.toSet).take(3)} extra=${buf.toSet.diff(lazySet).take(3)}")
    spark.catalog.clearCache()
  }
}

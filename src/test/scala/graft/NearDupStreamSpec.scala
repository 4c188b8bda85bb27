package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream
import graft.streaming.CurationStream.TimedDoc
import graft.operators.DedupOps

/** Streaming near-dup must make the same decisions as the batch MinHash
  * path: streamed against the full-corpus band index, the verified pair
  * set equals DedupOps.nearDupPairs exactly — same candidates (band
  * collision is the same predicate), same exact-Jaccard verification,
  * duplicates (multi-band collisions, both-members-arrive) collapsed by
  * the watermark dedup. */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-static near-dup matches batch nearDupPairs on sf0.001") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val corpus = DedupOps.docHashes(spark, TestSpark.sf0001).persist()
    try {
      val batchPairs = DedupOps.nearDupPairs(spark, TestSpark.sf0001)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchPairs.nonEmpty, "fixture must contain near-dup pairs")

      val docs = Tables.documents(spark, TestSpark.sf0001)
        .select(col("doc_id").as("docId"), col("lang"), col("text"),
          (col("doc_id") * 1000000L).as("tsUs"))
        .as[TimedDoc].collect()

      val source = MemoryStream[TimedDoc]
      val q = NearDupStream
        .nearDupAgainstCorpus(spark, source.toDS(), corpus)
        .writeStream.format("memory").queryName("neardup")
        .outputMode("append").start()
      try {
        // arrival order != doc_id order, split across micro-batches, so
        // cross-batch discovery and both-members-arrive dedup are exercised
        docs.sortBy(d => d.docId * 2654435761L % 1000000007L)
          .grouped(docs.length / 3 + 1).foreach { batch =>
            source.addData(batch.toIndexedSeq: _*)
            q.processAllAvailable()
          }
        val streamed = spark.sql("SELECT doc_a, doc_b FROM neardup")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(streamed == batchPairs,
          s"stream-only: ${(streamed -- batchPairs).take(5)}; batch-only: ${(batchPairs -- streamed).take(5)}")
      } finally q.stop()
    } finally corpus.unpersist()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.RetrievalOps
import graft.sources.LexIndex
import graft.streaming.RetrievalStream

/** Top-level so Spark can build its encoder without an outer scope. */
case class QueryEv(query_id: Int, qtext: String, ts: java.sql.Timestamp)

/** Long-keyed variant: streams key queries by corpus doc_id (LongType). */
case class QueryEvL(query_id: Long, qtext: String, ts: java.sql.Timestamp)

/** Streaming BM25 against the published posting-list artifact must agree
  * with the gated batch probe: the fixed query set streamed across
  * multiple triggers yields exactly q_bm25_topk_idx's rows (which the
  * DuckDB gate pins against the inline scoring). */
class RetrievalStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed queries equal the batch artifact probe across triggers") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val d = TestSpark.sf0001
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-stream").toString + "/idx"
    LexIndex.publish(spark, d, dir)

    val expected = LexIndex.searchBm25(spark, dir,
        RetrievalOps.BmQueries, RetrievalOps.Bm25TopK)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(expected.nonEmpty)

    val evs = RetrievalOps.BmQueries.map { case (id, text) =>
      QueryEv(id, text, new java.sql.Timestamp(1700000000000L + id))
    }
    val buf = scala.collection.mutable.Set[(Int, Int, Long, Double)]()
    val source = MemoryStream[QueryEv]
    val q = source.toDF().writeStream
      .foreachBatch(RetrievalStream.foreachBatchProbe(spark, dir,
        RetrievalOps.Bm25TopK) { out =>
        buf.synchronized {
          buf ++= out.collect().map(r =>
            (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        }
      })
      .start()
    try {
      // two triggers: per-query top-k is trigger-local, and the fixed
      // set holds distinct query ids, so the union equals the batch run
      evs.grouped(2).foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(buf.toSet == expected,
      s"missing=${expected.diff(buf.toSet).take(3)} " +
        s"extra=${buf.toSet.diff(expected).take(3)}")
  }

  test("long query ids and unnormalized text probe correctly") {
    import spark.implicits._
    val d = TestSpark.sf0001
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-long").toString + "/idx"
    LexIndex.publish(spark, d, dir)
    // id past Int range pins the type-preserving path; mixed case,
    // punctuation and a repeated term pin query normalization (the
    // stored terms are lowercase \W+ tokens, contributions distinct)
    val batch = Seq((9000000007L, "Fast, TABLE table scan!"))
      .toDF("query_id", "qtext")
    val got = RetrievalStream
      .probeIndexBatch(spark, dir, batch, RetrievalOps.Bm25TopK)
      .get.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val want = LexIndex.searchBm25(spark, dir,
        Seq(1 -> "fast table scan"), RetrievalOps.Bm25TopK).collect()
      .map(r => (9000000007L, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)

    // a term-less trigger (all punctuation) skips the probe entirely
    val dud = Seq((1L, "?!, .")).toDF("query_id", "qtext")
    assert(RetrievalStream
      .probeIndexBatch(spark, dir, dud, RetrievalOps.Bm25TopK).isEmpty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.LedgerOps
import graft.streaming.LedgerStream

/** The streaming ledger must converge to the batch latest-attempt result
  * under adversarial arrival order — duplicates interleaved, attempts out
  * of order — because both reference guards (resend LongHashSet, stale-
  * attempt discard) live in one keyed state machine. */
class LedgerStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("adversarially-ordered stream converges to the batch ledger") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val d = TestSpark.sf0001
    // the RAW fixture (duplicates still present — the stream must dedup),
    // in a deterministic shuffled order that interleaves attempts and dups
    val raw = LedgerOps.blocks(spark, d)
      .select(col("event_id"), col("map_id"), col("attempt_id"),
        col("seq_id"), col("length").cast("long").as("length"), col("dup"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getBoolean(5)))
      .sortBy { case (ev, m, att, seq, _, dup) =>
        val x = ev * 31 + att * 7 + seq + (if (dup) 13 else 0)
        ((x % 1000000007L) * 2654435761L) % 1000000007L
      }
    assert(raw.exists(_._3 == 1L), "fixture has no retry attempts - vacuous")
    assert(raw.length > raw.map(t => (t._2, t._3, t._4)).distinct.length,
      "fixture has no duplicate blocks - vacuous")

    val evs = raw.map { case (_, m, att, seq, len, _) =>
      LedgerStream.LedgerRow(new java.sql.Timestamp(1700000000000L), m, att, seq, len)
    }
    val source = MemoryStream[LedgerStream.LedgerRow]
    val q = LedgerStream.latestWins(spark, source.toDF())
      .writeStream.format("memory").queryName("ledger_stream")
      .outputMode("update").start()
    try {
      evs.grouped(evs.length / 5 + 1).foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // current value per map = its max-upd emission
      val streamed = spark.sql(
          """SELECT map_id, cnt, len_sum FROM (
            |  SELECT *, row_number() OVER (PARTITION BY map_id ORDER BY upd DESC) rn
            |  FROM ledger_stream) WHERE rn = 1""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = LedgerOps.queries("q_latest_attempt")(spark, d)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"missing: ${batch.diff(streamed).take(3)}; extra: ${streamed.diff(batch).take(3)}")
    } finally q.stop()
  }
}

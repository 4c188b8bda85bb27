package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.HealthOps
import graft.streaming.AdmissionStream

/** Top-level so Spark can build its encoder without an outer scope. */
case class AdmissionEv(event_id: Long, user_id: Long, event_type: String,
    ep: Long)

/** Streaming admission control must make the same decisions as
  * q_admission_quota when requests arrive in (ep, event_id) order —
  * the online/batch parity the repo pins for every stateful operator
  * pair (WorkerHealth, NearDupStream). */
class AdmissionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream decisions equal the batch query under in-order arrival") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val batch = SparkEntry.queries("q_admission_quota")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(batch.nonEmpty && batch.values.exists(v => !v),
      "fixture must contain rejections")

    val evs = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ep"))
      .as[AdmissionEv].collect()
      .sortBy(e => (e.ep, e.event_id))

    val source = MemoryStream[AdmissionEv]
    val q = AdmissionStream.fromEvents(spark, source.toDF(),
        HealthOps.AdmissionCap, HealthOps.AdmissionExclude,
        HealthOps.AdmissionPrefixLen)
      .writeStream.format("memory").queryName("admission")
      .outputMode("append").start()
    try {
      // order preserved across micro-batches: online processing of the
      // same arrival sequence the batch query models
      evs.grouped(evs.length / 3 + 1).foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT event_id, admitted FROM admission")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(streamed.size === batch.size, "decision count mismatch")
      val diff = batch.collect {
        case (id, a) if streamed.get(id) != Some(a) =>
          (id, a, streamed.get(id))
      }
      assert(diff.isEmpty, s"divergent decisions: ${diff.take(5)}")
      // parity == no decision flagged: the ordering contract's witness
      val flagged = spark.sql(
        "SELECT count(*) FROM admission WHERE out_of_order").collect()(0).getLong(0)
      assert(flagged === 0L, s"$flagged decisions flagged on an in-order feed")
    } finally q.stop()
  }

  test("cross-batch disorder is flagged per decision") {
    // a request delivered in a LATER batch than a larger (ep, event_id)
    // key is decided in processing order — still deterministic and
    // cap-respecting, but not the batch decision; the high-water mark in
    // state must flag exactly those requests
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[AdmissionEv]
    val q = AdmissionStream.fromEvents(spark, source.toDF(), 2, "xxx", 3)
      .writeStream.format("memory").queryName("admission_ooo")
      .outputMode("append").start()
    try {
      // batch 1: keys 10..14; batch 2: keys 5..7 (behind the high-water
      // mark) plus 20 (ahead of it)
      source.addData((10 to 14).map(i => AdmissionEv(i.toLong, i.toLong, "sig", 1000L + i)): _*)
      q.processAllAvailable()
      source.addData((Seq(5, 6, 7, 20)).map(i => AdmissionEv(i.toLong, i.toLong, "sig", 1000L + i)): _*)
      q.processAllAvailable()
      val flags = spark.sql("SELECT event_id, out_of_order FROM admission_ooo")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(flags.size === 9)
      assert((5 to 7).forall(i => flags(i.toLong)), s"late keys unflagged: $flags")
      assert(((10 to 14) ++ Seq(20)).forall(i => !flags(i.toLong)),
        s"in-order keys flagged: $flags")
    } finally q.stop()
  }

  test("holder state is bounded by the cap") {
    // the state a window carries is the holder list, never the request
    // log: at most AdmissionCap appIds regardless of traffic. (Pinned on
    // the type: List[Long] updated only below cap — this test documents
    // the invariant by driving far more requests than permits through
    // one window and asserting admissions.)
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[AdmissionEv]
    val q = AdmissionStream.fromEvents(spark, source.toDF(), 2, "xxx", 3)
      .writeStream.format("memory").queryName("admission_cap")
      .outputMode("append").start()
    try {
      // 50 requests, 10 distinct apps, one (ns, hr) window
      val evs = (0 until 50).map(i => AdmissionEv(i.toLong, (i % 10).toLong, "sig", 1000L + i))
      source.addData(evs: _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, admitted FROM admission_cap")
        .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      val admittedApps = rows.filter(_._2).map(_._1).distinct
      assert(admittedApps.length === 2, s"cap violated: $admittedApps")
      // every request from a holder re-admits; every other app is refused
      assert(rows.count(_._2) === 10, "holders must re-admit all requests")
    } finally q.stop()
  }
}

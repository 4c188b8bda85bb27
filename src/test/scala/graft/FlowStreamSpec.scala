package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.HealthOps
import graft.streaming.FlowStream

/** Top-level so Spark can build its encoder without an outer scope. */
case class FlowRawEv(event_id: Long, user_id: Long, ep: Long, props: String)

/** Streaming flow control must make the same decisions as q_flow_control
  * when requests arrive in (ep, event_id) order — the online/batch
  * parity contract every stateful operator pair in the repo carries. */
class FlowStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream decisions equal the batch ledger under in-order arrival") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val batch = SparkEntry.queries("q_flow_control")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(batch.nonEmpty && batch.values.exists(v => !v),
      "fixture must contain rejections")

    val evs = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ep"), col("props"))
      .as[FlowRawEv].collect()
      .sortBy(e => (e.ep, e.event_id))

    val source = MemoryStream[FlowRawEv]
    val q = FlowStream.fromEvents(spark, source.toDF(),
        HealthOps.FlowLimit, HealthOps.FlowHoldUs, HealthOps.FlowTenants)
      .writeStream.format("memory").queryName("flow")
      .outputMode("append").start()
    try {
      evs.grouped(evs.length / 3 + 1).foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT event_id, admitted FROM flow")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(streamed.size === batch.size, "decision count mismatch")
      val diff = batch.collect {
        case (id, a) if streamed.get(id) != Some(a) => (id, a, streamed.get(id))
      }
      assert(diff.isEmpty, s"divergent decisions: ${diff.take(5)}")
      val flagged = spark.sql(
        "SELECT count(*) FROM flow WHERE out_of_order").collect()(0).getLong(0)
      assert(flagged === 0L, s"$flagged decisions flagged on an in-order feed")
    } finally q.stop()
  }

  test("cross-batch disorder is flagged; the ledger still bounds admitted bytes") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[FlowRawEv]
    // limit 100, hold 48 h; all one tenant (user 3)
    val q = FlowStream.fromEvents(spark, source.toDF(),
        HealthOps.FlowLimit, HealthOps.FlowHoldUs, HealthOps.FlowTenants)
      .writeStream.format("memory").queryName("flow_ooo")
      .outputMode("append").start()
    try {
      // batch 1: eps 10, 20 (60 + 40 bytes admitted = at the limit)
      source.addData(
        FlowRawEv(1L, 3L, 10L, "x" * 60), FlowRawEv(2L, 3L, 20L, "x" * 40))
      q.processAllAvailable()
      // batch 2: ep 15 is BEHIND the high-water mark (flagged); the
      // ledger is already full, so it must also reject
      source.addData(FlowRawEv(3L, 3L, 15L, "x" * 10))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, admitted, out_of_order FROM flow_ooo")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
        .sortBy(_._1)
      assert(rows.toSeq == Seq((1L, true, false), (2L, true, false),
        (3L, false, true)), s"got ${rows.toSeq}")
    } finally q.stop()
  }
}

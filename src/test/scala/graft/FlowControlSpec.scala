package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HealthOps

/** Per-tenant concurrent-bytes admission (q_flow_control): admit while
  * in-flight bytes fit the budget, reject at the barrier, release after
  * the hold horizon, tenants fully isolated. */
class FlowControlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ledger admits to the limit, rejects over it, re-admits after release") {
    import spark.implicits._
    val H = HealthOps.FlowHoldUs // 48 h in µs
    // (event_id, user_id, ep µs, bytes) — tenant = user_id (< 50)
    val evs = Seq(
      (1L, 3L, 0L, 60),        // admit: 60 in flight
      (2L, 3L, 1000L, 50),     // reject: 60 + 50 > 100
      (3L, 3L, 2000L, 40),     // admit: 60 + 40 = 100 (exact fit)
      (4L, 3L, H + 5L, 50),    // admit: e1 expired, only e3 held (40 + 50)
      (5L, 3L, 2 * H + 3000L, 100), // admit: everything expired, 100 <= 100
      (6L, 4L, 500L, 200))     // reject: oversized even on an empty ledger
    val dir = java.nio.file.Files.createTempDirectory("graft-flow").toString
    evs.map { case (id, u, ep, b) => (id, u, "sig", ep * 1000L, "x" * b) }
      .toDF("event_id", "user_id", "event_type", "ts", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_flow_control")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val want = Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> true, 6L -> false)
    assert(got == want, s"got $got")
  }

  test("zipfian hot tenant: ledger stays exact under 90% tenant skew") {
    import spark.implicits._
    // ~90% of 8000 requests hit tenant 1 — the mega-tenant that serializes
    // its own history (SCALING.md flow-control row); the tail spreads over
    // tenants 2..49. Event spacing makes holds EXPIRE mid-stream, so the
    // hot tenant exercises admit, reject, and release continuously.
    val evs = (0 until 8000).map { i =>
      val u = if (i % 10 < 9) 1L else 2L + i % 48
      val ep = i.toLong * 100000000L // 100 s in µs; window holds ~1728 events
      val b = 10 + (i * 7) % 50
      (i.toLong, u, ep, b)
    }
    // independent single-threaded replay of the ledger, per tenant
    val expected = evs.groupBy(_._2).flatMap { case (_, rs) =>
      val q = scala.collection.mutable.Queue.empty[(Long, Long)]
      var inB = 0L
      rs.sortBy(r => (r._3, r._1)).map { case (id, _, ep, b) =>
        while (q.nonEmpty && q.head._1 <= ep - HealthOps.FlowHoldUs) {
          inB -= q.dequeue()._2
        }
        val adm = inB + b <= HealthOps.FlowLimit
        if (adm) { q.enqueue((ep, b.toLong)); inB += b }
        id -> adm
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-flowz").toString
    evs.map { case (id, u, ep, b) => (id, u, "sig", ep * 1000L, "x" * b) }
      .toDF("event_id", "user_id", "event_type", "ts", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expMap = expected.toMap
    val got = SparkEntry.queries("q_flow_control")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == expMap,
      s"diverged on ${got.count { case (k, v) => expMap(k) != v }} events")
    // the fixture must actually be skewed and the hot tenant must see
    // BOTH outcomes, or the case is vacuous
    val hot = evs.filter(_._2 == 1L).map(_._1).toSet
    assert(hot.size >= 7000)
    assert(hot.exists(got(_)) && hot.exists(!got(_)),
      "hot tenant saw only one outcome - barrier vacuous under skew")
  }

  test("busy control: priority raises the barrier, retry clamps, hard cap binds, holds release") {
    import spark.implicits._
    val H = HealthOps.FlowHoldUs
    // all on worker 2 (user_id = 2); prio = event_id % 3 + 1,
    // retry = event_id % 5 (clamped at BusyMaxRetryIdx = 3).
    // (event_id, ep µs) → expected, with held-count noted:
    val evs = Seq(
      (5L, 0L),          // prio3 r0 barrier5: 0<=5  admit  (held 1)
      (20L, 1000L),      // prio3 r0:          1<=5  admit  (2)
      (35L, 2000L),      // prio3 r0:          2<=5  admit  (3)
      (50L, 3000L),      // prio3 r0:          3<=5  admit  (4)
      (30L, 4000L),      // prio1 r0 barrier3: 4>3   REJECT (priority gates)
      (65L, 5000L),      // prio3 r0 barrier5: 4<=5  admit  (5)
      (24L, 6000L),      // prio1 r4→3 barrier6: 5<=6 admit (6)
      (9L, 7000L),       // prio1 r4→3 barrier6: 6<=6 admit (7)
      (39L, 7500L),      // prio1 r4→3 barrier6: 7>6 REJECT (uncapped r4
                         //   would read barrier 7 and admit — the clamp
                         //   is outcome-distinguishing here)
      (14L, 8000L),      // prio3 r4→3 barrier8: 7<=8 AND 7<8 admit (8)
      (29L, 9000L),      // prio3 r4→3 barrier8: 8<=8 BUT NOT 8<8 REJECT
                         //   (the hard slot total, above every barrier)
      (45L, H + 10000L)) // prio1 r0 barrier3: all held expired → admit
    val want = Map(5L -> true, 20L -> true, 35L -> true, 50L -> true,
      30L -> false, 65L -> true, 24L -> true, 9L -> true, 39L -> false,
      14L -> true, 29L -> false, 45L -> true)
    val dir = java.nio.file.Files.createTempDirectory("graft-busy").toString
    evs.map { case (id, ep) => (id, 2L, "sig", ep * 1000L, "x") }
      .toDF("event_id", "user_id", "event_type", "ts", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_flow_busy")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got == want, s"got $got")
  }

  test("the sf fixture exercises both outcomes (the barrier binds)") {
    val rows = SparkEntry.queries("q_flow_control")(spark, TestSpark.sf0001)
      .collect().map(_.getBoolean(3))
    assert(rows.contains(true) && rows.contains(false),
      s"constants leave the barrier vacuous: ${rows.count(_ == true)}/${rows.length} admitted")
    val busy = SparkEntry.queries("q_flow_busy")(spark, TestSpark.sf0001)
      .collect().map(_.getBoolean(4))
    assert(busy.contains(true) && busy.contains(false),
      s"busy constants vacuous: ${busy.count(_ == true)}/${busy.length} admitted")
  }
}

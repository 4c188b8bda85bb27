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

  test("the sf fixture exercises both outcomes (the barrier binds)") {
    val rows = SparkEntry.queries("q_flow_control")(spark, TestSpark.sf0001)
      .collect().map(_.getBoolean(3))
    assert(rows.contains(true) && rows.contains(false),
      s"constants leave the barrier vacuous: ${rows.count(_ == true)}/${rows.length} admitted")
  }
}

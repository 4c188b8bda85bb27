package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.WorkerHealth
import graft.streaming.WorkerHealth.{Heartbeat, HealthState}
import graft.operators.HealthOps

/** The blacklist/punish machine (SURVEY.md §2A #20): unit transitions of
  * the pure step function, and batch/stream decision parity — the SAME
  * fixture driven through the batch operator and the
  * flatMapGroupsWithState tracker must land in identical states. */
class WorkerHealthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hb(ts: Long, ok: Boolean = true, busy: Boolean = false) =
    Heartbeat(1L, ts, ok, busy)
  private def fold(hbs: Heartbeat*): HealthState =
    hbs.foldLeft(WorkerHealth.initial)(WorkerHealth.step)

  test("failed self-check blacklists; 3 consecutive OKs recover") {
    val afterFail = fold(hb(0), hb(10, ok = false))
    assert(afterFail.black && afterFail.nBlack == 1)
    // 2 OKs, a fail (resets the counter), then 3 OKs -> recovered once
    val s = fold(hb(0), hb(10, ok = false), hb(20), hb(30),
      hb(40, ok = false), hb(50), hb(60), hb(70))
    assert(!s.black && s.nRecover == 1 && s.nBlack == 1)
    // the reset matters: the reference's literal code increments the OK
    // counter on ANY heartbeat from a blacklisted worker, so fail-fail-OK
    // after a blacklist would "recover" there; our consecutive-OK intent
    // semantics (documented deviation) keep it blacklisted
    val s2 = fold(hb(0), hb(10, ok = false), hb(20), hb(30),
      hb(40, ok = false), hb(50))
    assert(s2.black, "2 OKs + fail + 1 OK must NOT recover")
  }

  test("missed heartbeat blacklists an online worker") {
    val gap = WorkerHealth.GapBlacklistMs
    val s = fold(hb(0), hb(gap + 1))
    assert(s.black && s.nBlack == 1)
    // an exact-threshold gap does not (strict >)
    assert(!fold(hb(0), hb(gap)).black)
  }

  test("busy punishes; still-busy at expiry doubles; idle releases") {
    val p0 = WorkerHealth.PunishBaseMs
    val s1 = fold(hb(0, busy = true))
    assert(s1.punished && s1.nPunish == 1 && s1.punishDur == p0)
    // still busy when the window expires -> doubled, still punished
    val s2 = fold(hb(0, busy = true), hb(p0 + 1, busy = true))
    assert(s2.punished && s2.nDouble == 1 && s2.punishDur == 2 * p0)
    // idle at expiry -> released, no doubling
    val s3 = fold(hb(0, busy = true), hb(0, busy = false), hb(p0 + 1))
    assert(!s3.punished && s3.nDouble == 0 && s3.nPunish == 1)
    // punished worker is offline but NOT blacklisted
    assert(s1.punished && !s1.black)
  }

  test("streaming tracker matches batch q_worker_health on sf0.001") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // arrival order = global time order, split into 3 micro-batches
    val all = HealthOps.heartbeats(spark, TestSpark.sf0001)
      .collect().sortBy(h => (h.ts, h.seq))
    val source = MemoryStream[Heartbeat]
    val q = WorkerHealth.track(spark, source.toDS())
      .writeStream.format("memory").queryName("health").outputMode("update")
      .start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { batch =>
        source.addData(batch.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // memory sink accumulates per-batch emissions; latest = max n_events
      val streamed = spark.sql(
        """SELECT worker_id, n_events, n_black, n_recover, n_punish,
          |       n_double, final_black, final_punished, final_online
          |FROM (SELECT *, max(n_events) OVER (PARTITION BY worker_id) AS mx
          |      FROM health)
          |WHERE n_events = mx
          |""".stripMargin)
        .collect().map(_.toSeq).toSet
      val batch = HealthOps.queries("q_worker_health")(spark, TestSpark.sf0001)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream/batch divergence: ${(streamed -- batch).take(3)} vs ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HealthOps

/** Semaphore semantics of q_admission_quota
  * (ApplicationRequestController.java:82-112): per (name-space, hour)
  * at most AdmissionCap distinct holders, holders re-admit, excluded
  * prefix bypasses. */
class AdmissionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    HealthOps.queries("q_admission_quota")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

  test("per window, admitted non-excluded holders never exceed the cap") {
    val byWindow = rows.filter(_._2 != HealthOps.AdmissionExclude)
      .groupBy(r => (r._2, r._3))
    byWindow.foreach { case ((ns, hr), rs) =>
      val holders = rs.filter(_._5).map(_._4).distinct
      assert(holders.length <= HealthOps.AdmissionCap,
        s"window ($ns,$hr) admitted ${holders.length} holders")
    }
    // the cap must actually bind somewhere or the fixture proves nothing
    assert(byWindow.exists(_._2.exists(!_._5)), "no rejection in fixture")
  }

  test("admission is per-appId, not per-request: a holder's later requests re-admit") {
    rows.filter(_._2 != HealthOps.AdmissionExclude)
      .groupBy(r => (r._2, r._3, r._4))
      .foreach { case ((ns, hr, uid), rs) =>
        val verdicts = rs.map(_._5).distinct
        assert(verdicts.length == 1,
          s"appId $uid in ($ns,$hr) got mixed verdicts — holderList broken")
      }
  }

  test("excluded prefix bypasses the quota entirely") {
    val excluded = rows.filter(_._2 == HealthOps.AdmissionExclude)
    assert(excluded.nonEmpty)
    assert(excluded.forall(_._5), "excluded-prefix request rejected")
  }
}

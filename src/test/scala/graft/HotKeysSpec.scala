package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.HotKeys
import graft.streaming.HotKeys.KeyedEvent

/** The streaming hot-key monitor's contract: per closed window, the MG
  * guarantees (superset of true-heavy keys, bounded undercount, size <= k)
  * hold against exact per-window counts — across micro-batch splits that
  * force partial-summary merges inside the state store. */
class HotKeysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 8
  private val HourUs = 3600L * 1000000L

  test("per-window sketch meets the MG guarantees across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // window 0: key "h0" hot (40 of 100 rows) over a 20-key tail;
    // window 1: "h1" hot (30 of 70) — different key, proves isolation
    val w0 = (0 until 40).map(i => KeyedEvent("h0", i.toLong * 1000)) ++
      (0 until 60).map(i => KeyedEvent(s"t${i % 20}", 40000L + i * 1000))
    val w1 = (0 until 30).map(i => KeyedEvent("h1", HourUs + i * 1000)) ++
      (0 until 40).map(i => KeyedEvent(s"t${i % 20}", HourUs + 30000L + i * 1000))
    // a third-window sentinel far ahead advances the watermark so both
    // real windows close and emit in append mode
    val sentinel = Seq(KeyedEvent("zz", 5 * HourUs))

    val source = MemoryStream[KeyedEvent]
    val q = HotKeys.hotKeys(source.toDS(), "1 hour", K, "0 seconds")
      .writeStream.format("memory").queryName("hotkeys").outputMode("append")
      .start()
    try {
      // split mid-window so the same window's summary merges across
      // micro-batches (the order-dependent path the guarantee must survive)
      source.addData(w0.take(50): _*)
      q.processAllAvailable()
      source.addData(w0.drop(50) ++ w1: _*)
      q.processAllAvailable()
      source.addData(sentinel: _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hotkeys ORDER BY window_start").collect()
      assert(rows.length == 2, s"expected both closed windows, got ${rows.length}")
      val byWindow = rows.map { r =>
        (r.getLong(2), r.getMap[String, Long](3).toMap)
      }
      val truths = Seq(w0, w1).map(_.groupBy(_.key).view.mapValues(_.size.toLong).toMap)
      byWindow.zip(truths).foreach { case ((n, sketch), truth) =>
        assert(n == truth.values.sum)
        assert(sketch.size <= K)
        val slack = n.toDouble / (K + 1)
        val mustHave = truth.filter(_._2 > slack).keySet
        assert((mustHave -- sketch.keySet).isEmpty,
          s"heavy keys missing: ${mustHave -- sketch.keySet} in $sketch")
        sketch.foreach { case (key, est) =>
          assert(est <= truth(key) && truth(key) - est <= slack,
            s"$key est $est vs true ${truth(key)} (slack $slack)")
        }
      }
      // the hot keys specifically survived
      assert(byWindow(0)._2.contains("h0") && byWindow(1)._2.contains("h1"))
    } finally q.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.TransitionStream
import graft.operators.GraphAnalyticsOps

/** The streaming transition extractor must reproduce the batch lag-window
  * transition counts for any in-order feed (whole-fixture and split
  * micro-batches), and must FLAG cross-batch disorder instead of silently
  * splicing history. */
class TransitionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batchCounts(sf: String): Map[(String, String), Long] =
    GraphAnalyticsOps.queries("q_event_transitions")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def fixtureEvents(sf: String): Array[TransitionStream.Ev] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("t"))
      .collect()
      .map(r => TransitionStream.Ev(r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3)))
      .sortBy(e => (e.t, e.event_id)) // global event-time order

  private def runStream(batches: Seq[Seq[TransitionStream.Ev]], name: String)
      : Array[TransitionStream.Transition] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[TransitionStream.Ev]
    // the module consumes the raw events contract (nanos ts): rebuild it
    val df = source.toDF()
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("t") * 1000L).as("ts"))
    val q = TransitionStream.transitions(spark, df)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      spark.table(name).collect().map(r => TransitionStream.Transition(
        r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    } finally q.stop()
  }

  test("whole-fixture feed reproduces the batch transition counts") {
    val sf = TestSpark.sf0001
    val got = runStream(Seq(fixtureEvents(sf).toSeq), "trans_one")
    assert(!got.exists(_.out_of_order))
    val counts = got.groupBy(t => (t.prev_type, t.next_type))
      .map { case (k, v) => k -> v.length.toLong }
    assert(counts === batchCounts(sf))
    spark.catalog.clearCache()
  }

  test("split in-order feed reproduces the batch transition counts") {
    val sf = TestSpark.sf0001
    val evs = fixtureEvents(sf)
    val (a, b) = evs.splitAt(evs.length / 2)
    val got = runStream(Seq(a.toSeq, b.toSeq), "trans_split")
    assert(!got.exists(_.out_of_order))
    val counts = got.groupBy(t => (t.prev_type, t.next_type))
      .map { case (k, v) => k -> v.length.toLong }
    assert(counts === batchCounts(sf))
    spark.catalog.clearCache()
  }

  test("cross-batch disorder is flagged, frontier holds") {
    val mk = (id: Long, typ: String, t: Long) =>
      TransitionStream.Ev(7L, id, typ, t)
    val got = runStream(Seq(
      Seq(mk(1, "signup", 100), mk(3, "purchase", 300)), // frontier at 300
      Seq(mk(2, "view", 200)),                           // behind the frontier
      Seq(mk(4, "click", 400))),                         // in order again
      "trans_ooo")
    val inOrder = got.filter(!_.out_of_order)
      .map(t => (t.prev_type, t.next_type)).toSet
    val flagged = got.filter(_.out_of_order)
      .map(t => (t.prev_type, t.next_type)).toSet
    // the late 'view' is attributed from the frontier and flagged; the
    // frontier stays at 'purchase', so 'click' chains from it
    assert(flagged === Set(("purchase", "view")))
    assert(inOrder === Set(("signup", "purchase"), ("purchase", "click")))
  }
}

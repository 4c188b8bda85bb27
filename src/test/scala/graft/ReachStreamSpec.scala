package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ReachStream

/** Top-level so Spark can build its encoder without an outer scope. */
case class ReachEv(user_id: Long, ts: java.sql.Timestamp)

/** The streamed per-day HLL reach sketch must equal the batch sketch
  * exactly — HLL unions take per-register maxima, so arrival order and
  * batch boundaries cannot move the estimate (the order-independence
  * property that makes the sketch safe as streaming state). */
class ReachStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed daily sketches equal batch estimates under adversarial splits") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val d = TestSpark.sf0001
    val evRows = Tables.events(spark, d)
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .collect().map(r => ReachEv(r.getLong(0),
        new java.sql.Timestamp(r.getLong(1) / 1000)))
    // batch truth over the SAME micro-precision instants
    val batch = evRows.toSeq.toDF("user_id", "ts")
      .select(col("user_id"),
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.size > 1)

    // adversarial arrival: reversed order, uneven batch splits
    val shuffled = evRows.reverse
    val source = MemoryStream[ReachEv]
    val q = ReachStream.dailyReach(spark, source.toDF())
      .writeStream.format("memory").queryName("daily_reach")
      .outputMode("complete").start()
    try {
      var rest = shuffled.toSeq
      var take = 1
      while (rest.nonEmpty) {
        val (b, r) = rest.splitAt(take)
        source.addData(b: _*)
        q.processAllAvailable()
        rest = r
        take = take * 3 + 1
      }
      val streamed = spark.sql("SELECT day, n_users_est FROM daily_reach")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        s"diverged: ${batch.toSet.diff(streamed.toSet).take(3)} vs " +
          s"${streamed.toSet.diff(batch.toSet).take(3)}")
    } finally q.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfOps

/** The generalized as-of join must agree with q_asof_join's oracle-checked
  * formulation and honor the <= visibility and tie rules. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("generalized asofJoin reproduces q_asof_join on the fixtures") {
    val sf = TestSpark.sf0001
    val left = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ep"))
    val right = Tables.orders(spark, sf)
    val got = AsOfOps.asofJoin(
        left, right,
        leftKey = col("user_id"), leftTime = col("ep"),
        rightKey = col("o_custkey"),
        rightTime = unix_micros(col("o_orderdate").cast("timestamp")),
        rightValue = col("o_orderkey"), tieBreak = col("o_orderkey"),
        out = "asof_orderkey")
      .select("user_id", "event_id", "asof_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val want = operators.CoreOps.queries("q_asof_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == want)
  }

  test("equal-timestamp right row is visible; later rows are not") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 50L, "e0")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, "rAt100"), (1L, 101L, "rAt101"),
      (1L, 100L, "rAt100b")).toDF("k", "t", "v")
    val out = AsOfOps.asofJoin(left, right,
        col("k"), col("t"), col("k"), col("t"), col("v"), col("v"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    // at t=100 both right rows are visible; larger tie-break wins
    assert(out("e1") == "rAt100b")
    // at t=50 nothing has happened yet
    assert(out("e0") == null)
  }
}

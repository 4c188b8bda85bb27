package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.AsOfOps

/** The generalized as-of join must match an independently-built
  * union+window reference on the fixtures (q_asof_join itself now runs
  * through AsOfOps, and its DuckDB oracle gates it end-to-end), and honor
  * the <=-visibility, tie, and NULL rules. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofJoin matches an inline union+window reference on the fixtures") {
    val sf = TestSpark.sf0001
    // reference: the hand-rolled formulation q_asof_join used before the
    // AsOfOps refactor, kept here as an independent oracle
    val ord = Tables.orders(spark, sf).select(
      col("o_custkey").as("k"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      lit(0).as("is_event"), col("o_orderkey").as("okey"),
      lit(null).cast("bigint").as("eid"))
    val ev = Tables.events(spark, sf).select(
      col("user_id").as("k"), expr("ts div 1000").as("t"),
      lit(1).as("is_event"), lit(null).cast("bigint").as("okey"),
      col("event_id").as("eid"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("is_event"), col("okey"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = ord.unionByName(ev)
      .withColumn("asof_orderkey", last(col("okey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("k"), col("eid"), col("asof_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    val got = operators.CoreOps.queries("q_asof_join")(spark, sf)
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

  test("null semantics: null value carried, null keys never match") {
    import spark.implicits._
    val left = Seq((1L, 30L, "a"), (2L, 30L, "b")).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(10L), Some("old"), 1L),
      (Some(1L), Some(20L), None, 2L),        // latest row carries NULL value
      (None, Some(5L), Some("nullkey"), 3L),  // null key: matches nothing
      (Some(2L), None, Some("nulltime"), 4L)  // null time: matches nothing
    ).toDF("k", "t", "v", "tb")
    val out = AsOfOps.asofJoin(left, right,
        col("k"), col("t"), col("k"), col("t"), col("v"), col("tb"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    // the latest visible right ROW's value is null -> output null (not "old")
    assert(out("a") == null)
    // k=2's only right row has null time -> no match
    assert(out("b") == null)
  }

  test("reserved left column names fail fast") {
    import spark.implicits._
    val left = Seq((1L, 1L, "x")).toDF("k", "t", "asof_value")
    val right = Seq((1L, 1L, "v")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfOps.asofJoin(left, right,
        col("k"), col("t"), col("k"), col("t"), col("v"), col("v"))
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.RankOps

/** The distributed global row-number must be bit-identical to the
  * single-partition window formulation for any total order, including
  * duplicate keys broken by tie-break columns and skewed distributions
  * (all quantile buckets collapsing onto few values). */
class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def assertMatchesWindow(
      df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column,
      ties: Seq[org.apache.spark.sql.Column],
      buckets: Int): Unit = {
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy(key +: ties: _*)))
    // smallInputBytes = 0 forces the bucketed path — these tests exist to
    // pin ITS equivalence; the fast path is covered separately below
    val got = RankOps.globalRowNumber(df, key, ties, buckets, "rn",
      smallInputBytes = 0L)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      s"buckets=$buckets")
  }

  test("unique keys: matches global window across bucket counts") {
    val df = Tables.supplier(spark, TestSpark.sf0001)
      .select("s_suppkey", "s_name")
    for (b <- Seq(1, 4, 64)) assertMatchesWindow(df, col("s_suppkey"), Nil, b)
  }

  test("duplicate keys with tie-breaks: equal keys never split across buckets") {
    val df = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    assertMatchesWindow(df, col("l_suppkey"),
      Seq(col("l_orderkey"), col("l_linenumber")), 16)
  }

  test("heavy skew: one dominant key, more buckets than distinct keys") {
    import spark.implicits._
    val df = (Seq.fill(500)(7L) ++ Seq(1L, 2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
    assertMatchesWindow(df, col("k"), Seq(col("id")), 32)
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("k", "id")
    assert(RankOps.globalRowNumber(df, col("k"), Seq(col("id")), 8).isEmpty)
  }

  test("small inputs take the direct-window fast path, same results") {
    val df = Tables.supplier(spark, TestSpark.sf0001)
      .select("s_suppkey", "s_name")
    // default threshold: plan statistics classify the fixture as small
    val fast = RankOps.globalRowNumber(df, col("s_suppkey"), Nil, 64, "rn")
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("s_suppkey"))))
    assert(fast.exceptAll(expected).isEmpty && expected.exceptAll(fast).isEmpty)
    // no bucket machinery in the fast path's plan
    assert(!fast.queryExecution.executedPlan.toString.contains("__graft_rank_bucket"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves the SCALING.md claim: bucketed tables co-locate repeated joins —
  * the join executes with NO shuffle exchange on either side (the 100 TB
  * strategy for fact-fact joins the reference serves via worker groups). */
class BucketJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join on bucketed tables plans no shuffle exchange") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, TestSpark.sf0001)
        .write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(spark, TestSpark.sf0001)
        .write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // inspect only the final plan's join subtree: everything below the
      // SortMergeJoin line must be bucketed scans, no exchange
      val finalPlan = p.split("== Initial Plan ==")(0)
      val joinSection = finalPlan.substring(finalPlan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(joinSection.contains("Bucketed: true"),
        s"scan not bucketed:\n$p")
      // sanity: result matches the unbucketed computation
      val direct = Tables.lineitem(spark, TestSpark.sf0001)
        .join(Tables.orders(spark, TestSpark.sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val bucketed = joined.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(bucketed == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}

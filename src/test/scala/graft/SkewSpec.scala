package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewOps

/** Salted aggregation must equal direct aggregation for any salt width. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted sum/count == direct groupBy (exact long domain)") {
    import spark.implicits._
    // integer value domain so sums are order-insensitive-exact
    val df = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag").as("k"),
        col("l_quantity").cast("long").as("v"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (salts <- Seq(1, 7, 32)) {
      val salted = SkewOps.saltedSumCount(df, "k", "v", salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == direct, s"salts=$salts")
    }
  }

  test("pre-existing salt-like columns don't corrupt the aggregation") {
    import spark.implicits._
    val df = Seq(("a", 1L, 9L, 9L), ("a", 2L, 9L, 9L), ("b", 3L, 9L, 9L))
      .toDF("k", "v", "_salt", "cnt")
    val out = SkewOps.saltedSumCount(df, "k", "v", 4,
        sumCol = "total", cntCol = "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 3L, 2L), ("b", 3L, 1L)))
  }
}

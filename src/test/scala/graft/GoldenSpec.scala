package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreOps

/** The reference's own golden values, re-expressed
  * (Ors2ShuffleManagerTest.scala:60-81, Ors2ShuffleDistributeTest.scala:56-74). */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flagship golden: 1..10000 repartitioned -> count=10000, sum=50005000") {
    val row = spark.range(1, 10001).toDF("v")
      .repartition(10)
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .head()
    assert(row.getLong(0) == 10000L)
    assert(row.getLong(1) == 50005000L)
  }

  test("group assignment balance: 4000 partitions over 3 groups, max-min <= 1") {
    val counts = CoreOps.queries("q_group_assignment")(spark, TestSpark.sf0001)
      .select("cnt").as[Long].collect()
    assert(counts.length == 3)
    assert(counts.max - counts.min <= 1)
    assert(counts.sum == 4000)
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle-only keys: ${os.diff(qs)}")
  }
}

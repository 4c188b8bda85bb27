package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-format agnosticism — the engine's counterpart to the reference's
  * scheme-dispatched storage abstraction (FileSystem.java:30-128,
  * storage/fs/{local,dfs,cfs,alluxio}): the same declarative query yields
  * identical results over parquet, CSV, JSON and ORC copies of a table,
  * and filters push down to both columnar formats' scans. */
class SourceFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("same aggregate over parquet, csv and json sources") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority") // skip timestamp col: csv/json round-trip differs
    val dir = Files.createTempDirectory("graft-src").toString
    orders.write.mode("overwrite").parquet(s"$dir/pq")
    orders.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    orders.write.mode("overwrite").json(s"$dir/json")
    orders.write.mode("overwrite").orc(s"$dir/orc")

    val fromPq = agg(spark.read.parquet(s"$dir/pq"))
    val fromCsv = agg(spark.read.option("header", "true")
      .schema(orders.schema).csv(s"$dir/csv"))
    val fromJson = agg(spark.read.schema(orders.schema).json(s"$dir/json"))
    val fromOrc = agg(spark.read.orc(s"$dir/orc"))
    assert(fromPq == fromCsv)
    assert(fromPq == fromJson)
    assert(fromPq == fromOrc)
    assert(fromPq.nonEmpty)
  }

  test("predicate pushdown reaches both parquet and orc scans") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderpriority")
    val dir = Files.createTempDirectory("graft-push").toString
    for (fmt <- Seq("parquet", "orc")) {
      orders.write.mode("overwrite").format(fmt).save(s"$dir/$fmt")
      val plan = spark.read.format(fmt).load(s"$dir/$fmt")
        .filter(col("o_orderkey") === 42L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
        s"$fmt: $plan")
    }
  }

  test("partitionBy layout prunes at the directory level") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "lang", "n_chars")
    val dir = Files.createTempDirectory("graft-part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$dir/bylang")
    val df = spark.read.parquet(s"$dir/bylang").filter(col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), not
    // as a data filter evaluated over every partition's rows
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(df.count() ==
      docs.filter(col("lang") === "en").count())
  }
}

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

  test("fixture-typing guards: ts and date columns normalize from either parquet typing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-typing").toString
    // events.ts as int64 nanos (the rounds-<=6 typing): passes through
    val nanos = 1700000000123456789L
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val evRow = Tables.events(spark, dir).select("ts").head()
    assert(evRow.getLong(0) == nanos, "long ts must pass through untouched")
    // events.ts as timestamp (round-7 typing): converts to epoch nanos
    val dir2 = Files.createTempDirectory("graft-typing2").toString
    Seq((1L, new java.sql.Timestamp(nanos / 1000000)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val evRow2 = Tables.events(spark, dir2).select("ts").head()
    assert(evRow2.getLong(0) == (nanos / 1000000) * 1000000,
      "timestamp ts must convert to epoch nanos")
    // l_shipdate as int64 nanos: converts back to a timestamp
    Seq((1L, nanos)).toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val li = Tables.lineitem(spark, dir)
    assert(li.schema("l_shipdate").dataType.typeName.startsWith("timestamp"),
      s"long l_shipdate must normalize to a timestamp, got ${li.schema("l_shipdate").dataType}")
    val micros = li.select(unix_micros(col("l_shipdate").cast("timestamp")))
      .head().getLong(0)
    assert(micros == nanos / 1000, "nanos -> timestamp must truncate to micros")
    // o_orderdate already a timestamp: untouched
    val od = Tables.orders(spark, TestSpark.sf0001).schema("o_orderdate")
    assert(od.dataType.typeName.startsWith("timestamp"))
  }

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

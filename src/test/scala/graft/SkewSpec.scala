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

  test("salted agg == direct on a zipfian hot-key distribution") {
    import spark.implicits._
    // key k appears ~20000/k times: key 1 dominates with 20k copies while
    // the tail is sparse — the hot-key shape AQE cannot split for an agg
    val df = spark.range(1, 201)
      .select(col("id").as("k"), (lit(20000L) / col("id")).cast("long").as("copies"))
      .withColumn("i", explode(sequence(lit(1L), col("copies"))))
      .select(col("k"), (col("k") * 1000L + col("i")).as("v"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedSumCount(df, "k", "v", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("AQE splits the skewed join partition (skew=true in the final plan)") {
    val s = spark
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // left side: ~98% of rows carry key 0 -> one shuffle partition far
      // exceeds both the absolute threshold and factor×median
      val left = s.range(0, 100000).select(
        when(col("id") % 50 === 0, col("id") % 97 + 1).otherwise(0L).as("k"),
        col("id").as("v"))
      val right = s.range(0, 98).select(col("id").as("k"), (col("id") * 7).as("w"))
      val out = left.join(right, "k").select("v")
      val n = out.collect().length
      assert(n == 100000, s"join row count $n")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("salted join == plain inner join on a zipfian hot-key distribution") {
    // ~98% of left rows carry key 0; right is slim (the salting contract)
    val left = spark.range(0, 50000).select(
      when(col("id") % 50 === 0, col("id") % 97 + 1).otherwise(0L).as("k"),
      col("id").as("v"))
    val right = spark.range(0, 98).select(col("id").as("k"), (col("id") * 7).as("w"))
    val direct = left.join(right, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    for (salts <- Seq(1, 8)) {
      val salted = SkewOps.saltedJoin(left, right, "k", salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == direct, s"salts=$salts")
    }
  }

  test("salted join keeps duplicate right-side matches (multiset semantics)") {
    import spark.implicits._
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val right = Seq((1L, 10L), (1L, 20L), (3L, 30L)).toDF("k", "w")
    val out = SkewOps.saltedJoin(left, right, "k", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(out.toSeq == Seq((1L, "a", 10L), (1L, "a", 20L),
      (1L, "b", 10L), (1L, "b", 20L)))
  }

  test("salted dedup == direct window dedup on a zipfian composite-key flood") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // (map_id, seq_id) zipfian: key (0, s) holds ~80% of 40k rows across 4
    // seq values — one composite key is ~20% of the table, the funnel a
    // window-based dedup ships to a single reducer
    val df = spark.range(0, 40000).select(
      when(col("id") % 5 < 4, 0L).otherwise(col("id") % 7 + 1).as("map_id"),
      (col("id") % 4).as("seq_id"),
      (col("id") % 11).as("attempt_id"),
      col("id").as("event_id"),
      (col("id") * 13 % 997).as("length"))
    val w = Window.partitionBy("map_id", "seq_id")
      .orderBy("attempt_id", "event_id")
    val direct = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(_.toSeq).toSet
    for (salts <- Seq(1, 16)) {
      val salted = SkewOps.saltedDedup(df,
          keys = Seq("map_id", "seq_id"),
          order = Seq("attempt_id", "event_id"), salts = salts)
        .collect().map(_.toSeq).toSet
      assert(salted == direct, s"salts=$salts")
    }
  }

  test("salted dedup preserves the caller's column order and names") {
    import spark.implicits._
    val df = Seq((1L, "b", 9L), (1L, "a", 7L), (2L, "z", 1L))
      .toDF("k", "tag", "v")
    val out = SkewOps.saltedDedup(df, keys = Seq("k"), order = Seq("tag"), 4)
    assert(out.columns.toSeq == Seq("k", "tag", "v"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((1L, "a", 7L), (2L, "z", 1L)))
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

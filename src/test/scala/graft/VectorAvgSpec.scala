package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** vector_avg must equal the posexplode+avg formulation (same math, one
  * exchange instead of an exploded pair) and handle nulls/empties. */
class VectorAvgSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  test("matches posexplode+groupBy mean on the embeddings corpus") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val native = e.groupBy("label")
      .agg(expr("vector_avg(embedding)").as("c"))
      .select(col("label"), posexplode(col("c")))
      .collect().map(r => (r.get(0).toString, r.getInt(1)) -> r.getDouble(2)).toMap
    val exploded = e.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(avg("col").as("m"))
      .collect().map(r => (r.get(0).toString, r.getInt(1)) -> r.getDouble(2)).toMap
    assert(native.keySet == exploded.keySet)
    for ((k, v) <- native)
      assert(math.abs(v - exploded(k)) < 1e-9, s"dim $k")
  }

  test("a vector containing a null element is skipped entirely") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(1, Seq(1.0, 2.0)), Row(1, Seq(3.0, null)), Row(2, Seq(null, null)))
    val df = spark.createDataFrame(rows, schema)
    val out = df.groupBy("k").agg(expr("vector_avg(v)").as("m"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    // the partial vector must not poison the mean (and must not be read
    // as zeros): group 1 averages only the clean vector
    assert(out(1) == Seq(1.0, 2.0))
    assert(out(2) == null)
  }

  test("skips null arrays; all-null group yields null") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(Seq(1.0f, 3.0f))),
      ("a", None),
      ("a", Some(Seq(3.0f, 5.0f))),
      ("b", None),
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(expr("vector_avg(v)").as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(out("a") == Seq(2.0, 4.0))
    assert(out("b") == null)
  }

  test("mixed-dimension vectors are skipped, never corrupt the buffer") {
    import spark.implicits._
    // single partition -> deterministic: dimension fixes on the first
    // vector, the dim-3 row is skipped like a null-element vector
    val df = Seq(
      ("a", Seq(1.0, 3.0)), ("a", Seq(9.0, 9.0, 9.0)), ("a", Seq(3.0, 5.0)))
      .toDF("k", "v").coalesce(1)
    val out = df.groupBy("k").agg(expr("vector_avg(v)").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(2.0, 4.0))
  }

  test("works in partial/final split across many partitions") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 7, Seq(i.toDouble, -i.toDouble)))
      .toDF("k", "v").repartition(32)
    val out = df.groupBy("k").agg(expr("vector_avg(v)").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for ((k, m) <- out) {
      val xs = (1 to 1000).filter(_ % 7 == k).map(_.toDouble)
      assert(math.abs(m.head - xs.sum / xs.size) < 1e-9)
      assert(math.abs(m(1) + xs.sum / xs.size) < 1e-9)
    }
  }
}

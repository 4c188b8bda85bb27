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

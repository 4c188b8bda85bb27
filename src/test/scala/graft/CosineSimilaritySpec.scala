package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Unit tests for the native CosineSimilarity expression: correctness vs a
  * built-in composition, codegen/interpreted agreement, edge cases. */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  private def df = {
    import spark.implicits._
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),   // identical -> 1
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),               // orthogonal -> 0
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f)),             // opposite -> -1
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),               // zero vec -> 0
    ).toDF("a", "b")
  }

  test("matches expected values") {
    val got = df.select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
    val want = Seq(1.0, 0.0, -1.0, 0.0)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("agrees with zip_with/aggregate composition on the corpus") {
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    val composed = e.as("a").crossJoin(e.as("b"))
      .select(
        expr("cosine_sim(a.embedding, b.embedding)").as("native"),
        expr("""
          aggregate(zip_with(CAST(a.embedding AS ARRAY<DOUBLE>),
                             CAST(b.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y),
                    0D, (acc, v) -> acc + v) /
          (sqrt(aggregate(transform(CAST(a.embedding AS ARRAY<DOUBLE>), x -> x * x),
                          0D, (acc, v) -> acc + v)) *
           sqrt(aggregate(transform(CAST(b.embedding AS ARRAY<DOUBLE>), x -> x * x),
                          0D, (acc, v) -> acc + v)))""").as("builtin"))
    val bad = composed.filter(abs(col("native") - col("builtin")) > 1e-9).count()
    assert(bad == 0)
  }

  test("null inputs yield null") {
    import spark.implicits._
    val d = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = d.select(expr("cosine_sim(a, b)")).collect()
    assert(r.head.isNullAt(0))
  }

  test("interpreted path (no codegen) agrees") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val got = df.select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
      assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(2) + 1.0) < 1e-12)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}

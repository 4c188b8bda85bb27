package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q_feature_hash semantics pinned against an independent Scala fold:
  * same tokenizer, same 31-base char fold, same slot/sign split — any
  * drift in the expression tree (split semantics, ascii of '', div vs
  * floor) breaks equality. The DuckDB oracle carries engine parity; this
  * spec carries the arithmetic's ground truth.
  */
class FeatureHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private val dim = TextOps.FeatureHashDim

  private def refVector(text: String): Map[Int, Long] = {
    val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val hs = toks.map(_.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P))
    hs.foldLeft(Map.empty[Int, Long].withDefaultValue(0L)) { (m, h) =>
      val slot = (h % dim).toInt
      val sgn = if ((h / dim) % 2 == 0) 1L else -1L
      m.updated(slot, m(slot) + sgn)
    }.filter(_._2 != 0L)
  }

  test("feature hash equals the independent Scala fold on a crafted fixture") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog", "en", "src0", 43L),
      (2L, "a a a a b b c", "en", "src0", 13L),          // repeats accumulate
      (3L, "", "en", "src0", 0L),                        // empty doc: no rows
      (4L, "punct,,,only???  ", "en", "src0", 17L))
    val dir = java.nio.file.Files.createTempDirectory("graft-fh").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.queries("q_feature_hash")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = docs.flatMap { case (id, text, _, _, _) =>
      refVector(text).map { case (slot, w) => (id, slot) -> w }
    }.toMap
    assert(got === want)
    // signed accumulation really fired: doc 2's repeated token weights
    val doc2 = got.collect { case ((2L, _), w) => w }
    assert(doc2.exists(w => math.abs(w) > 1), s"no accumulation in $doc2")
  }

  test("the plan shuffles no data: map-side fold + posexplode, range exchange only") {
    val df = TextOps.queries("q_feature_hash")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"feature hash should not shuffle on any key:\n$plan")
    assert(plan.contains("Generate posexplode"), s"sparse explode missing:\n$plan")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{MGBuf, MisraGriesAgg}

/** The Misra-Gries summary's contract, proven on a zipf-ish fixture whose
  * key cardinality EXCEEDS the summary size — the regime the sketch
  * exists for:
  *   1. size bound: never more than k retained entries,
  *   2. superset guarantee: every key with true count > n/(k+1) present,
  *   3. error bound: each estimate within n/(k+1) of its true count,
  * all through Spark's partial/final typed-aggregate path (4 partitions →
  * real merges), and the same bounds for direct reduce/merge calls
  * (driver-side unit check, no Spark).
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 50 hot keys (count 200-ish down to 4) over a 2000-key uniform tail —
  // deterministic, heavier than k=64 can hold exactly
  private val K = 64
  private def fixture: Seq[String] = {
    val hot = (0 until 50).flatMap(i => Seq.fill(200 / (i + 1))(s"hot_$i"))
    val tail = (0 until 4000).map(i => s"tail_${i % 2000}")
    // deterministic interleave (no shuffle/random: same stream every run)
    (hot ++ tail).sortBy(_.hashCode)
  }

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def assertBounds(sketch: Map[String, Long], xs: Seq[String]): Unit = {
    val n = xs.size.toLong
    val truth = trueCounts(xs)
    val slack = n / (K + 1) // floor(n/(k+1)) >= the real bound's value
    assert(sketch.size <= K, s"summary holds ${sketch.size} > $K entries")
    val mustHave = truth.filter(_._2 > n.toDouble / (K + 1)).keySet
    val missing = mustHave -- sketch.keySet
    assert(missing.isEmpty, s"heavy keys absent from summary: $missing")
    sketch.foreach { case (t, est) =>
      val actual = truth(t)
      assert(est <= actual, s"$t overcounted: est $est > true $actual")
      assert(actual - est <= slack,
        s"$t undercounted past the bound: est $est, true $actual, slack $slack")
    }
  }

  test("bounds hold through Spark partial/final aggregation") {
    import spark.implicits._
    val xs = fixture
    val ds = spark.createDataset(xs).repartition(4)
    val sketch = ds.select(new MisraGriesAgg(K).toColumn).head()
    assert(sketch.n == xs.size, "buffer-carried n must equal rows seen")
    assertBounds(sketch.m, xs)
  }

  test("bounds hold for direct reduce + pairwise merge") {
    val agg = new MisraGriesAgg(K)
    val xs = fixture
    val parts = xs.grouped(math.max(1, xs.size / 7)).toSeq
    val merged = parts
      .map(p => p.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assert(merged.n == xs.size, "n must survive merge")
    assertBounds(agg.finish(merged).m, xs)
  }

  test("q_heavy_hitters equals the exact full groupBy on real data") {
    val hh = operators.TextOps.queries("q_heavy_hitters")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact reference computation: full groupBy, same threshold formula
    val bigrams = Tables.documents(spark, TestSpark.sf0001)
      .select(operators.TextRules.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))
        .as("term"))
    val n = bigrams.count()
    val threshold = n / (operators.TextOps.MgSummarySize + 1) + 1
    val exact = bigrams.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hh == exact)
    assert(hh.nonEmpty, "fixture produced no heavy hitters — threshold too high")
  }
}

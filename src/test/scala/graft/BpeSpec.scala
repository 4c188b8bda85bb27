package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Bpe, GraftFunctions}

/** The shipped BPE tokenizer: deterministic merge table, the encode
  * contract (leftmost lowest-priority, one instance per step), and the
  * expression's codegen placement. Oracle parity of the full recursion is
  * covered by q_bpe_count's DuckDB gate. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge table is deterministic, non-trivial, and priority-ordered") {
    assert(Bpe.merges.nonEmpty && Bpe.merges.size <= Bpe.MaxMerges)
    assert(Bpe.merges.distinct.size === Bpe.merges.size, "duplicate merge")
    // retraining is bit-identical (lazy val, but the contract is the point)
    assert(Bpe.merges === Bpe.merges)
  }

  test("trained words collapse to one token; unseen words split to subwords") {
    for (w <- Seq("the", "join", "hash", "merge", "filter"))
      assert(Bpe.encode(w) === Vector(w), s"trained word $w did not collapse")
    for (w <- Seq("customer", "vector", "window", "stream"))
      assert(Bpe.encode(w).length > 1, s"unseen word $w became one token")
    // subwords must still concatenate back to the word (no loss)
    for (w <- Seq("customer", "vector", "xylophone", "sparkles"))
      assert(Bpe.encode(w).mkString === w)
  }

  test("encode edge cases: empty, single char, chars outside the alphabet") {
    assert(Bpe.encode("") === Vector.empty)
    assert(Bpe.encode("x") === Vector("x"))
    // no merge applies to unseen characters: one token per char
    assert(Bpe.encode("zzz7").length === 4)
  }

  test("distributed trainer reproduces the embedded table; learned table feeds counts") {
    import spark.implicits._
    import graft.operators.TextOps
    // the SAME word multiset Bpe.train consumes, as a DataFrame
    val words = Bpe.trainingText.toLowerCase.split("\\W+").filter(_.nonEmpty)
      .groupBy(identity).toSeq.map { case (w, g) => (w, g.length.toLong) }
      .toDF("word", "cnt")
    // run to exhaustion (early-stops when no pair repeats) — the learned
    // table must equal the embedded trainer's BIT FOR BIT
    val learned = TextOps.bpeTrain(spark, words, Bpe.MaxMerges)
      .collect().map(r => (r.getString(1), r.getString(2))).toVector
    assert(learned === Bpe.merges,
      s"distributed trainer diverged at index " +
        s"${learned.zip(Bpe.merges).indexWhere(p => p._1 != p._2)}")
    // learned-table → count equivalence: encoding under the learned table
    // is the shipped bpe_count, for trained words, subword splits, and
    // out-of-alphabet input alike
    for (w <- Seq("the", "join", "merge", "customer", "vector", "stream",
        "xylophone", "zzz7", "sparkles", "a"))
      assert(Bpe.encodeWith(w, learned) === Bpe.encode(w),
        s"learned-table encode diverged for '$w'")
  }

  test("q_bpe_train emits one merge per round with consistent ranks") {
    val rows = SparkEntry.queries("q_bpe_train")(spark, TestSpark.sf0001).collect()
    assert(rows.length === graft.operators.TextOps.BpeTrainRounds)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length, "a pair was learned twice")
    assert(rows.forall(_.getLong(3) >= 2), "winner below the f >= 2 floor")
  }

  test("q_bpe_learned_count: learned-table budgets are coherent per doc") {
    val rows = SparkEntry.queries("q_bpe_learned_count")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nWords, nBpe) = (r.getLong(1), r.getLong(2))
      // every word is >= 1 token; an 8-merge table leaves most words split
      assert(nBpe >= nWords, s"doc ${r.getLong(0)}: $nBpe tokens < $nWords words")
    }
    // the learned merges must actually compress SOMETHING vs chars
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("q_bpe_count uses the native expression in a single map-side Project") {
    val df = SparkEntry.queries("q_bpe_count")(spark, TestSpark.sf0001)
    assert(df.collect().map(_.getLong(2)).sum > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the native expression, not a UDF: higher-order lambdas (aggregate)
    // are CodegenFallback in Spark, so no whole-stage span to assert —
    // the interpreted lambda plumbing invokes BpeCount.eval per word, and
    // the per-word merge loop itself is compiled JVM code either way
    assert(plan.contains("bpecount"), s"native expression missing:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // plan shape: expression work only — the sole exchange is the output
    // sort's range partitioning, no aggregation shuffle
    assert(!plan.contains("HashAggregate"), s"unexpected shuffle agg:\n$plan")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Cap-engaged cross-corpus dedup: the width cap truncates a flooded
  * bucket to its representative, which can hide the globally-best match;
  * the refine pass must recover it and the cap_engaged flag must mark
  * exactly the probes whose candidate set was truncated. */
class CrossDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 200-token common prefix dominates every MinHash band; 10 exact
  // prefix-only copies guarantee flooded buckets at any tiny cap. The
  // probe's exact twin (907, J = 1.0) shares its suffix with five
  // near-twins (900..904, each one extra unique token, J ≈ 0.995), so at
  // cap = 1 the suffix buckets flood too and the star representative is
  // 900 — NOT the best match. Only the refine pass can surface 907.
  private val prefix = (0 until 200).map(i => s"w$i").mkString(" ")
  private def corpus(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    val docs =
      (100L to 109L).map(id => (id, prefix)) ++
        (0 until 5).map(i => (900L + i, s"$prefix sx1 sx2 sx3 u$i")) ++
        Seq((907L, s"$prefix sx1 sx2 sx3"), (300L, s"$prefix zz1 zz2 zz3"))
    docs.toDF("doc_id", "text")
  }
  private def incoming(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, s"$prefix sx1 sx2 sx3")).toDF("doc_id", "text")
  }

  private def run(cap: Long, refine: Boolean): Map[Long, (Long, Double, Boolean)] =
    DedupOps.crossDedupBest(spark, incoming(spark), corpus(spark),
        cap = cap, refine = refine)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap

  test("refined result equals the uncapped computation on a flood") {
    val refined = run(cap = 1L, refine = true)
    val uncapped = run(cap = Long.MaxValue, refine = true)
    // matches and scores identical; only the flag differs (that is its job)
    assert(refined.view.mapValues(v => (v._1, v._2)).toMap ==
      uncapped.view.mapValues(v => (v._1, v._2)).toMap)
    assert(refined(1L)._3, "flood probe must be flagged cap_engaged")
    assert(uncapped.values.forall(!_._3), "uncapped run must flag nothing")
    // and the recovered match is the exact twin, not a star representative
    assert(refined(1L)._1 == 907L, s"expected twin 907, got ${refined(1L)}")
    assert(refined(1L)._2 == 1.0)
  }

  test("without refinement the capped match is the representative, and flagged") {
    val capped = run(cap = 1L, refine = false)
    val (matchId, jaccard, flagged) = capped(1L)
    assert(flagged, "truncated probe must carry cap_engaged = true")
    // the star representative of the flooded suffix bucket is 900 (min
    // doc_id); the true best (907, J = 1.0) is hidden behind the cap —
    // exactly the routing case the flag exists for
    assert(matchId == 900L, s"expected capped rep 900, got $matchId")
    assert(jaccard < 1.0 && jaccard >= 0.8)
  }

  test("the cap genuinely drops candidates that refinement re-admits") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val inD = DedupOps.docHashesOf(spark, incoming(spark))
      .withColumn("msig", expr("minhash_sig(hs)"))
    val corpD = DedupOps.docHashesOf(spark, corpus(spark))
      .withColumn("msig", expr("minhash_sig(hs)"))
    val cappedN = DedupOps.crossDedupCandidates(spark, inD, corpD, cap = 1L).count()
    val fullN = DedupOps.crossDedupCandidates(spark, inD, corpD,
      cap = Long.MaxValue).count()
    assert(cappedN < fullN,
      s"flood fixture must shrink the candidate set ($cappedN vs $fullN)")
  }
}

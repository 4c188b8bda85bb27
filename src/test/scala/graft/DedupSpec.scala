package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.operators.DedupOps

/** Near-dup sketches must agree with exact Jaccard — both on the corpus
  * and on a planted fixture with known duplicates. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(q: String, dir: String): Set[(Long, Long)] =
    DedupOps.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash == exact blocked jaccard on sf0.001") {
    val exact = pairs("q_ngram_jaccard", TestSpark.sf0001)
    val mh = pairs("q_text_minhash", TestSpark.sf0001)
    assert(exact.nonEmpty, "corpus has planted near-dups")
    assert(mh == exact)
  }

  test("simhash == exact blocked jaccard on sf0.001") {
    val exact = pairs("q_ngram_jaccard", TestSpark.sf0001)
    val sh = pairs("q_text_simhash", TestSpark.sf0001)
    assert(sh == exact)
  }

  test("df-cap bounds the candidate join under a boilerplate flood") {
    import spark.implicits._
    // 200 docs all share 5 boilerplate shingle hashes (the templated-footer
    // case); only docs 0 and 1 also share 28 content hashes (true near-dup)
    val rows = (0 until 200).flatMap { d =>
      val boiler = (1L to 5L).map(h => (d.toLong, h))
      val content =
        if (d <= 1) (100L to 127L).map(h => (d.toLong, h)) :+ (d.toLong, 1000L + d)
        else (0 until 29).map(i => (d.toLong, 10000L + d * 100L + i))
      boiler ++ content
    }
    val sh = rows.toDF("doc_id", "h")
    val uncapped = DedupOps.cappedCandidates(sh, Long.MaxValue).count()
    val capped = DedupOps.cappedCandidates(sh, 10L).count()
    // uncapped: every pair collides on boilerplate -> d² flood
    assert(uncapped == 200L * 199L / 2)
    // capped: boilerplate (df=200 > 10) excluded from pairing, unique
    // content (df=1) can't pair -> only the genuine overlap survives
    assert(capped == 1L)
  }

  test("sf0.001 is below the relative df-cap: capped == uncapped result") {
    // the production cap max(1000, 0.5% of docs) must be inert on corpora
    // without boilerplate floods — q_ngram_jaccard's oracle equivalence
    // (checked by the driver) plus this pin keep the cap honest
    assert(DedupOps.ngramDfCap(500) == 1000L)
    assert(DedupOps.ngramDfCap(1000000) == 5000L)
  }

  test("planted fixture: near-dup pair found, distinct docs not") {
    import spark.implicits._
    val base = (0 until 40).map(i => s"tok${i * 7 % 13} word$i item${i % 5}").mkString(" ")
    val nearDup = base.replace("word3 ", "changed3 ") // one token -> 3 shingles differ
    val other = (0 until 40).map(i => s"zeta${i * 11 % 17} gamma$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, other, "en", "src0", other.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-dedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val found = pairs("q_text_minhash", dir)
    assert(found == Set((0L, 1L)))
    val foundSim = pairs("q_text_simhash", dir)
    assert(foundSim == Set((0L, 1L)))
  }
}

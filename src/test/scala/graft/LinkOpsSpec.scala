package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LinkOps

/** The deletion-neighborhood blocking must be LOSSLESS for Levenshtein
  * distance <= 2 (the cover lemma) — pinned against a brute-force DP on
  * a crafted fixture plus a randomized edit fuzz, including pairs whose
  * first token differs (naive first-token blocking would drop those). */
class LinkOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def pairsOf(names: Seq[String]): Set[(String, String, Long)] = {
    import spark.implicits._
    val df = names.toDF("name")
    LinkOps.fuzzyPairs(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  private def bruteOf(names: Seq[String]): Set[(String, String, Long)] =
    (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet

  test("fuzzyPairs equals brute-force DP on a crafted fixture") {
    val names = Seq(
      "red widget",    // vs "bed widget" (sub in FIRST token), "red widgets"
      "bed widget",    // first-token-differs pair at dist 1
      "red widgets",   // suffix insert, dist 1 from "red widget"
      "red wldgets",   // dist 2 from "red widget" (insert + sub)
      "blue bolt",     // vs "glue bolts": 2 edits crossing the space
      "glue bolts",
      "blue baseplate",// dist 3+ from everything — must NOT appear
      "a",             // tiny strings exercise the len<2 guards
      "b", "ab", "",
      "aaaa", "aaab",  // repeated chars: deletion keys collide heavily
    )
    assert(pairsOf(names) === bruteOf(names))
  }

  test("fuzzyPairs equals brute-force DP under randomized <=2-edit fuzz") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def mutate(s: String): String = {
      val sb = new StringBuilder(s)
      rnd.nextInt(3) match {
        case 0 if sb.nonEmpty => sb.deleteCharAt(rnd.nextInt(sb.length)); sb.toString
        case 1 => sb.insert(rnd.nextInt(sb.length + 1), alpha(rnd.nextInt(alpha.length))); sb.toString
        case _ if sb.nonEmpty =>
          sb.setCharAt(rnd.nextInt(sb.length), alpha(rnd.nextInt(alpha.length))); sb.toString
        case _ => sb.toString
      }
    }
    val bases = Seq.fill(12)(Seq.fill(6 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString)
    val names = (bases ++ bases.map(mutate) ++ bases.map(s => mutate(mutate(s)))).distinct
    assert(pairsOf(names) === bruteOf(names))
  }

  test("deletion-key width cap keeps a short-name flood linear (star degradation)") {
    import spark.implicits._
    // 50 names "a0".."a49"-style sharing ONE deletion key ("a", from
    // deleting the suffix char): uncapped blocking enumerates C(50,2)
    // candidates from that key alone
    val flood = (0 until 50).map(i => s"a${('0' + i % 10).toChar}${('a' + i / 10).toChar}")
      .distinct
    val df = flood.toDF("name")
    val uncapped = LinkOps.fuzzyCandidates(df, cap = Long.MaxValue).count()
    val capped = LinkOps.fuzzyCandidates(df, cap = 5).count()
    // star degradation: every hot key contributes w-1 pairs, not C(w,2)
    assert(capped < uncapped)
    assert(capped <= 6L * flood.length, s"capped candidates $capped not linear")
    // every flood member still reaches the key's rep (one component via
    // the star), and every emitted pair is genuinely verified
    val verified = LinkOps.fuzzyPairs(df, cap = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(verified.nonEmpty)
    verified.foreach { case (a, b, d) => assert(lev(a, b) == d && d <= 2) }
  }

  test("width cap is inert at fixture key widths (capped == uncapped candidates)") {
    import spark.implicits._
    val names = Seq("red widget", "bed widget", "red widgets", "blue bolt",
      "glue bolts", "a", "b", "ab", "", "aaaa", "aaab").toDF("name")
    val def_ = LinkOps.fuzzyCandidates(names)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val raw = LinkOps.fuzzyCandidates(names, cap = Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(def_ === raw)
  }

  test("q_fuzzy_join output is name-level, ordered, with multiplicities") {
    val out = operators.LinkOps.queries("q_fuzzy_join")(spark, TestSpark.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // name_a < name_b and globally ordered
    rows.foreach(r => assert(r.getString(0) < r.getString(1)))
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
    // dist within the threshold, multiplicities positive
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 2)
      assert(r.getLong(3) >= 1 && r.getLong(4) >= 1)
    }
  }
}

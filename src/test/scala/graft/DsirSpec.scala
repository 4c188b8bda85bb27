package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationOps

/** q_dsir_weights vs an independent pure-Scala recomputation over the
  * sf0.001 corpus: tokenization, uni+bigram features, the md5-prefix
  * slot hash, the quality gate, Laplace-smoothed bucket distributions
  * and the per-doc log-ratio sum are all re-derived here with plain
  * collections (java MessageDigest for the hash) — no Spark expressions
  * shared with the implementation. Also pins the method-level sanity
  * property the weights exist for: the mean weight of target docs
  * exceeds the mean weight of non-target docs whenever both exist.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private val B = CurationOps.DsirBuckets

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  /** The engine's portable md5-prefix hash: first 15 hex chars of
    * md5(gram) as int64, mod 1e9+7, mod B. */
  private def slot(gram: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 1000000007L) % B).toInt
  }

  private def qualityOk(toks: Seq[String]): Boolean = {
    val n = toks.length
    n >= 10 && n <= 1000 && {
      val mean = toks.map(_.length).sum.toDouble / n
      val stop = toks.count(_ == "the").toDouble / n
      mean >= 2.0 && mean <= 12.0 && stop <= 0.2
    }
  }

  test("q_dsir_weights matches a pure-Scala DSIR recomputation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tokenize(r.getString(1))).toMap
    val grams: Map[Long, Seq[String]] = docs.map { case (id, t) =>
      id -> (t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" })
    }
    val target = docs.map { case (id, t) => id -> qualityOk(t) }
    val slotOcc: Map[Long, Map[Int, Int]] = grams.map { case (id, gs) =>
      id -> gs.groupBy(slot).map { case (sl, o) => sl -> o.size }
    }
    val rc = Array.fill(B)(0L); val tc = Array.fill(B)(0L)
    slotOcc.foreach { case (id, m) =>
      m.foreach { case (sl, occ) =>
        rc(sl) += occ; if (target(id)) tc(sl) += occ
      }
    }
    val rTot = rc.sum; val tTot = tc.sum
    val lr = Array.tabulate(B)(b =>
      math.log((tc(b) + 1.0) * (rTot + B) / ((rc(b) + 1.0) * (tTot + B))))

    val got = CurationOps.queries("q_dsir_weights")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    val nonEmptyDocs = grams.filter(_._2.nonEmpty).keySet
    assert(got.map(_._1).toSet == nonEmptyDocs,
      "one row per doc with at least one feature")

    got.foreach { case (id, nFeats, isTarget, logw) =>
      val m = slotOcc(id)
      assert(nFeats == m.values.sum.toLong, s"doc $id n_feats")
      assert(isTarget == target(id), s"doc $id is_target")
      val want = BigDecimal(m.map { case (sl, occ) => occ * lr(sl) }.sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(logw == want, s"doc $id weight")
    }

    val (tw, fw) = got.partition(_._3)
    if (tw.nonEmpty && fw.nonEmpty) {
      val tMean = tw.map(_._4).sum / tw.length
      val fMean = fw.map(_._4).sum / fw.length
      assert(tMean > fMean,
        "target docs must average a higher importance weight than non-target")
    }
  }
}

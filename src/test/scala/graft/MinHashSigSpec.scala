package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native MinHashSig expression must match the pure-SQL formulation
  * bit-for-bit (codegen and interpreted paths). */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }
  private val P = 1000000007L

  private val sqlForm =
    s"""transform(sequence(0, 31), b ->
       |  array_min(transform(hs, h ->
       |    pmod(((4 * b + 1) * 2654435761L % ${P}L) * pmod(h, ${P}L) + (2 * b) * 40503L, ${P}L))) * ${P}L +
       |  array_min(transform(hs, h ->
       |    pmod(((4 * b + 3) * 2654435761L % ${P}L) * pmod(h, ${P}L) + (2 * b + 1) * 40503L, ${P}L)))
       |)""".stripMargin

  test("native expression == SQL formulation on corpus hash arrays") {
    val docs = graft.operators.DedupOps.docHashes(spark, TestSpark.sf0001)
    val bad = docs
      .select(expr("minhash_sig(hs)").as("native"), expr(sqlForm).as("sql"))
      .filter(col("native") =!= col("sql"))
      .count()
    assert(bad == 0)
  }

  test("handles negative hashes and empty arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(-42L, Long.MinValue + 1, Long.MaxValue, 0L)),
      (2L, Seq.empty[Long]),
    ).toDF("id", "hs")
    val rows = df.select(col("id"), expr("minhash_sig(hs)").as("sig")).collect()
    val nonEmpty = rows.find(_.getLong(0) == 1L).get
    assert(nonEmpty.getSeq[Long](1).length == 32)
    // empty input -> null signature (identical sentinels would collide
    // every empty doc in every LSH band)
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("null elements are skipped, not read as garbage") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Long]](Some(7L), None, Some(99L))),
      (2L, Seq[Option[Long]](Some(7L), Some(99L))),
      (3L, Seq[Option[Long]](None, None)),
    ).toDF("id", "hs")
    val rows = df.select(col("id"), expr("minhash_sig(hs)").as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    // signature over {7, null, 99} == signature over {7, 99}
    assert(rows(1L) == rows(2L))
    // all-null behaves like empty: null signature
    assert(rows(3L) == null)
  }
}

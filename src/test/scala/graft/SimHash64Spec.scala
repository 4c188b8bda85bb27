package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native SimHash64 must match the pure-SQL aggregate formulation
  * bit-for-bit on the real corpus, and handle null/empty edges. */
class SimHash64Spec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  // `& 1`, not `% 2`: shiftrightunsigned(h, 0) == h keeps the sign for
  // j=0, and % follows the dividend's sign — the original %-formulation
  // mis-weighted bit 0 of negative hashes (caught by this native/SQL diff)
  private val sqlForm =
    """aggregate(sequence(0, 63), 0L, (acc, j) ->
      |  acc + IF(aggregate(hs, 0L, (a2, h) ->
      |             a2 + (CAST(shiftrightunsigned(h, j) & 1 AS BIGINT) * 2 - 1)) > 0,
      |           shiftleft(1L, j), 0L))""".stripMargin

  test("native == SQL formulation on corpus hash arrays") {
    val docs = graft.operators.DedupOps.docHashes(spark, TestSpark.sf0001)
    val bad = docs
      .select(expr("simhash64(hs)").as("native"), expr(sqlForm).as("sql"))
      .filter(col("native") =!= col("sql"))
      .count()
    assert(bad == 0)
  }

  test("null elements skipped; empty and all-null yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Long]](Some(-1L), None, Some(3L))),
      (2L, Seq[Option[Long]](Some(-1L), Some(3L))),
      (3L, Seq.empty[Option[Long]]),
      (4L, Seq[Option[Long]](None)),
    ).toDF("id", "hs")
    val out = df.select(col("id"), expr("simhash64(hs)").as("sh"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == out(2L) && out(1L).isDefined)
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("tie on a bit means the bit is clear") {
    import spark.implicits._
    // two elements: bit0 of 1L set, bit0 of 2L clear -> tie -> clear;
    // bit1: only 2L has it -> tie -> clear. simhash must be 0.
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "hs")
    assert(df.select(expr("simhash64(hs)")).collect()(0).getLong(0) == 0L)
  }
}

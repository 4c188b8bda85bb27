package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LedgerOps

/** Ledger invariants from the reference's read-side guards
  * (ShufflePartitionReader.java:378-393, Ors2Util.scala:75-81,
  * ShufflePartitionReader.java:217-249; FIXTURES.md §B). */
class LedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val blocks = LedgerOps.blocks(spark, TestSpark.sf0001).cache()

  test("dedup removes exactly the dup slice") {
    val total = blocks.count()
    val dups = blocks.filter(col("dup")).count()
    val deduped = blocks.dropDuplicates("map_id", "attempt_id", "seq_id").count()
    assert(dups > 0, "fixture must contain duplicates")
    assert(deduped == total - dups)
  }

  test("latest-attempt filter keeps only max attempt per map") {
    val d = blocks.filter(!col("dup"))
    val kept = d
      .withColumn("max_att",
        max("attempt_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("map_id")))
      .filter(col("attempt_id") === col("max_att"))
    // every map_id has a retry slice at this sf -> only attempt 1 survives
    val atts = kept.select("attempt_id").distinct().collect().map(_.getLong(0))
    assert(atts.toSet == Set(1L))
  }

  test("checksum verification flags exactly the corrupted groups") {
    val mismatches = LedgerOps.queries("q_checksum_verify")(spark, TestSpark.sf0001)
    val m = mismatches.collect()
    assert(m.nonEmpty, "the ~1% corrupted slice must surface")
    // each mismatch differs by exactly the number of corrupted rows in it
    assert(m.forall(r => r.getLong(2) < r.getLong(3)))
  }

  test("seq_id is contiguous 1..n per (map, attempt)") {
    val bad = LedgerOps.queries("q_ledger_order")(spark, TestSpark.sf0001)
      .filter(!col("contiguous")).count()
    assert(bad == 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native HyperplaneSig must match the interpreted aggregate/zip_with
  * formulation it replaced (same arithmetic: w(j,k) = phash(j·dim+k+1)/P
  * − 0.5, sign-packed), and its multi-probe output must honor the
  * one-bit-flip contract. */
class HyperplaneSigSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }
  private val P = 1000000007L

  /** The pre-r4 interpreted formulation (VectorOps.bucketCol), verbatim:
    * per-plane aggregate(zip_with(...)) dot products, sign bits summed.
    * Fixture dim is 64, matching its hard-coded stride. */
  private def legacyBucket(nPlanes: Int): Column = {
    def plane(j: Int): Seq[Double] =
      (0 until 64).map { k =>
        (((j * 64L + k + 1L) * 2654435761L) % P).toDouble / P.toDouble - 0.5
      }
    (0 until nPlanes).map { j =>
      val dot = aggregate(
        zip_with(col("embedding").cast("array<double>"), typedlit(plane(j)),
          (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("native bucket == interpreted formulation on the embeddings fixture") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    for (width <- Seq(6, 8)) {
      val bad = e.select(
          element_at(expr(s"hyperplane_sig(embedding, $width, 0)"), 1).as("native"),
          legacyBucket(width).as("legacy"))
        .filter(col("native") =!= col("legacy"))
        .count()
      assert(bad == 0, s"width=$width: $bad rows diverge from legacy bucketCol")
    }
  }

  test("multi-probe output: distinct buckets, each a one-bit flip of the main") {
    val rows = Tables.embeddings(spark, TestSpark.sf0001)
      .select(expr("hyperplane_sig(embedding, 8, 3)").as("sig"))
      .collect().map(_.getSeq[Long](0))
    rows.foreach { sig =>
      assert(sig.length == 4)
      assert(sig.distinct.length == 4, s"duplicate probe buckets: $sig")
      val main = sig.head
      sig.tail.foreach { b =>
        assert(java.lang.Long.bitCount(main ^ b) == 1,
          s"probe $b is not a single-bit flip of $main")
      }
      // all buckets stay inside the width-8 code space
      sig.foreach(b => assert(b >= 0 && b < 256))
    }
  }

  test("buckets are balanced enough to be useful (no degenerate sign)") {
    val counts = Tables.embeddings(spark, TestSpark.sf0001)
      .select(element_at(expr("hyperplane_sig(embedding, 6, 0)"), 1).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    // 500 vectors over 64 buckets: a constant-sign plane would halve the
    // occupied bucket count; require a healthy spread instead
    assert(counts.length >= 32, s"only ${counts.length} buckets occupied")
    assert(counts.max <= 60, s"hottest bucket holds ${counts.max} of 500")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.DedupIndex

/** Incremental index maintenance must be indistinguishable from a full
  * rebuild: mergePublish(old index, batch) == publishFrom(latest-wins
  * union) on both artifacts — so consumers can alternate full rebuilds
  * and incremental merges freely. */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docRows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0),
      r.getSeq[Long](1).sorted.toList, r.getLong(2), r.getBoolean(3))).toSet
  private def bandRows(df: DataFrame) =
    df.select("band", "minhash", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("mergePublish equals a full rebuild of the latest-wins union") {
    val full = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val oldCorpus = full.filter(col("doc_id") % 3 =!= 0)
    // the batch: the missing third, plus EDITED resubmissions of ids the
    // old index already holds (latest-wins must replace their rows)
    val batch = full.filter(col("doc_id") % 3 === 0)
      .unionByName(full.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 1)
        .select(col("doc_id"), concat(col("text"), lit(" edited")).as("text")))
    val resubmitted = batch.join(oldCorpus, "doc_id").count()
    assert(resubmitted > 0, "no id overlap - latest-wins path not exercised")

    val base = java.nio.file.Files.createTempDirectory("graft-idx-merge")
    val dirA = s"$base/a"; val dirB = s"$base/b"; val dirC = s"$base/c"
    DedupIndex.publishFrom(spark, oldCorpus, dirA)
    val (nDocs, nBands) = DedupIndex.mergePublish(spark, dirA, batch, dirB)
    assert(DedupIndex.isPublished(spark, dirB))
    assert(nBands == nDocs * graft.functions.MinHashSig.DefaultBands)

    // reference: a from-scratch publish of the same latest-wins corpus
    val combined = oldCorpus.join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(batch)
    DedupIndex.publishFrom(spark, combined, dirC)

    assert(docRows(DedupIndex.loadDocs(spark, dirB)) ==
      docRows(DedupIndex.loadDocs(spark, dirC)), "docs artifacts differ")
    assert(bandRows(DedupIndex.loadBands(spark, dirB)) ==
      bandRows(DedupIndex.loadBands(spark, dirC)), "bands artifacts differ")
  }

  test("artifact-backed cross-dedup equals the inline q_cross_dedup plan") {
    val d = TestSpark.sf0001
    val inline = SparkEntry.queries("q_cross_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    val viaIdx = SparkEntry.queries("q_cross_dedup_idx")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inline.nonEmpty && viaIdx == inline)
    spark.catalog.clearCache()
  }

  test("published bands keep the hive-partitioned one-file-per-partition layout") {
    // publish AND merge must both land bands hive-partitioned by dpart,
    // one data file per partition directory, values inside the recorded
    // layout modulus — the invariant the pruned probe relies on
    val full = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-idx-layout")
    val dirA = s"$base/a"; val dirB = s"$base/b"
    DedupIndex.publishFrom(spark, full.filter(col("doc_id") % 2 === 0), dirA)
    DedupIndex.mergePublish(spark, dirA,
      full.filter(col("doc_id") % 2 === 1), dirB)
    for (dir <- Seq(dirA, dirB)) {
      val parts = DedupIndex.loadParts(spark, dir)
      val root = new java.io.File(s"$dir/bands")
      val partDirs = root.listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith("dpart="))
      assert(partDirs.nonEmpty, s"$dir/bands has no dpart hive directories")
      partDirs.foreach { pd =>
        val files = pd.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"$dir/bands/${pd.getName} holds ${files.length} data files, want 1")
        val value = pd.getName.stripPrefix("dpart=").toLong
        assert(value >= 0 && value < parts,
          s"$dir/bands/${pd.getName} outside the layout modulus $parts")
      }
      assert(!root.listFiles().exists(f =>
          f.isFile && f.getName.endsWith(".parquet")),
        s"$dir/bands has data files outside partition directories")
    }
    spark.catalog.clearCache()
  }

  test("limit 0 forces the full band scan, result-identical to the pruned probe") {
    // pruneRowLimit = 0 closes the prune gate: the probe must read the
    // whole band table and still produce exactly the pruned path's rows
    val d = TestSpark.sf0001
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-prune").toString
    val all = operators.DedupOps.docHashes(spark, d)
    DedupIndex.publishFrom(spark,
      Tables.documents(spark, d).filter(col("doc_id") % 2 === 0), dir)
    val batch = all.filter(col("doc_id") % 2 === 1)
    def rows(df: DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = rows(operators.DedupOps.crossDedupBestFromIndex(
      spark, dir, batch).select("doc_id", "match_id", "jaccard"))
    val full = rows(operators.DedupOps.crossDedupBestFromIndex(
      spark, dir, batch, pruneRowLimit = 0L)
      .select("doc_id", "match_id", "jaccard"))
    assert(pruned.nonEmpty && full == pruned)
    spark.catalog.clearCache()
  }

  test("an empty probe batch returns empty (the zero-literal isin edge)") {
    // the pruned path derives an EMPTY partition set from an empty batch
    // and must degrade to an empty (not failing) scan
    val d = TestSpark.sf0001
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-empty").toString
    DedupIndex.publishFrom(spark,
      Tables.documents(spark, d).select(col("doc_id"), col("text")).limit(50), dir)
    val none = operators.DedupOps.crossDedupBestFromIndex(spark, dir,
      operators.DedupOps.docHashes(spark, d).filter(col("doc_id") < 0))
    assert(none.count() == 0)
    spark.catalog.clearCache()
  }

  test("mergePublish refuses to write into the live index") {
    val full = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-self").toString
    DedupIndex.publishFrom(spark, full.limit(50), dir)
    intercept[IllegalArgumentException] {
      DedupIndex.mergePublish(spark, dir, full.limit(10), dir)
    }
  }
}

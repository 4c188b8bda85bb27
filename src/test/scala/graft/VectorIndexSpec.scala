package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.sources.{StorageOps, VectorIndex}

/** The published vector index must be (a) gate-consistent — the pointer
  * flips only over fully committed datasets; (b) probe-faithful — the
  * artifact-backed probe/search reproduce the inline plans' rows exactly;
  * (c) merge-sound — mergePublish equals a rebuild at the frozen
  * geometry + centroids (the DedupIndexSpec contract, adapted: a FREE
  * rebuild retrains centroids, so the equivalence target is the frozen
  * one, which is exactly what IVF ingest promises). */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def allEmb =
    Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))

  private def bucketRows(df: DataFrame) =
    df.select("bucket", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  private def cellRows(df: DataFrame) =
    df.select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

  test("publish -> gate -> load roundtrip with coherent meta") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx").toString
    assert(!VectorIndex.isPublished(spark, dir))
    val m = VectorIndex.publishFrom(spark, allEmb, dir)
    assert(VectorIndex.isPublished(spark, dir))
    assert(VectorIndex.loadMeta(spark, dir) == m)
    val n = allEmb.count()
    assert(m.n == n && m.width == VectorOps.lshWidthFor(n) &&
      m.cells == VectorOps.ivfCellsFor(n))
    // cells carry every corpus vector exactly once; buckets at most once
    // (the width cap may drop flooded members, inert at this SF)
    assert(VectorIndex.loadCells(spark, dir).count() == n)
    assert(VectorIndex.loadBuckets(spark, dir).select("vec_id")
      .distinct().count() == n)
    assert(VectorIndex.loadCentroids(spark, dir).count() <= m.cells)
    spark.catalog.clearCache()
  }

  test("artifact probe equals the inline cross-dedup plan") {
    val q = SparkEntry.queries("q_embed_cross_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qi = SparkEntry.queries("q_embed_cross_dedup_idx")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q.nonEmpty && qi == q)
    spark.catalog.clearCache()
  }

  test("artifact IVF search equals the inline q_ann_ivf plan") {
    val q = SparkEntry.queries("q_ann_ivf")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    spark.catalog.clearCache() // sharedAnn memo must not leak into _idx
    val qi = SparkEntry.queries("q_ann_ivf_idx")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(q.nonEmpty && qi == q)
    spark.catalog.clearCache()
  }

  test("artifact LSH search equals the inline q_ann_lsh plan") {
    val q = SparkEntry.queries("q_ann_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    spark.catalog.clearCache()
    val qi = SparkEntry.queries("q_ann_lsh_idx")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(q.nonEmpty && qi == q)
    spark.catalog.clearCache()
  }

  test("mergePublish equals a rebuild at the frozen geometry and centroids") {
    val full = allEmb
    val oldCorpus = full.filter(col("vec_id") % 3 =!= 0)
    // the batch: the missing third, plus RESUBMITTED ids with perturbed
    // embeddings (latest-wins must replace their bucket and cell rows)
    val resub = full.filter(col("vec_id") % 3 =!= 0 && col("vec_id") % 7 === 1)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(-x AS FLOAT))").as("embedding"))
    val batch = full.filter(col("vec_id") % 3 === 0).unionByName(resub)
    assert(resub.count() > 0, "no resubmitted ids - latest-wins not exercised")

    val base = java.nio.file.Files.createTempDirectory("graft-vecidx-merge")
    val dirA = s"$base/a"; val dirC = s"$base/c"
    val m0 = VectorIndex.publishFrom(spark, oldCorpus, dirA)
    val cent = VectorIndex.loadCentroids(spark, dirA)
    val m1 = VectorIndex.mergePublish(spark, dirA, batch)
    assert(VectorIndex.isPublished(spark, dirA))
    // geometry frozen; n re-counted over the merged corpus
    assert((m1.width, m1.probes, m1.cap, m1.cells) ==
      ((m0.width, m0.probes, m0.cap, m0.cells)))
    assert(m1.n == full.count())

    // reference: rebuild the latest-wins union at the SAME geometry and
    // centroids (publishWith — what the freeze contract promises)
    val combined = oldCorpus.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(batch)
    VectorIndex.publishWith(spark, combined, dirC, m1, cent)
    assert(bucketRows(VectorIndex.loadBuckets(spark, dirA)) ==
      bucketRows(VectorIndex.loadBuckets(spark, dirC)), "bucket tables differ")
    assert(cellRows(VectorIndex.loadCells(spark, dirA)) ==
      cellRows(VectorIndex.loadCells(spark, dirC)), "cell lists differ")

    // the merge flipped to a NEW immutable version; the old one is
    // intact and still readable (mid-probe readers keep a whole index)
    assert(StorageOps.currentVersion(spark, dirA).contains("v2"))
    assert(spark.read.parquet(s"$dirA/v1/cells").count() == oldCorpus.count())
    // prune removes only non-active versions
    assert(VectorIndex.pruneVersions(spark, dirA, keep = 1) == Seq("v1"))
    assert(VectorIndex.isPublished(spark, dirA))
    spark.catalog.clearCache()
  }

  test("mergePublish re-ranks the frozen width cap over the merged buckets") {
    // publish with an artificially tiny cap, then merge a batch into the
    // same buckets: the merged table must hold <= cap members per bucket
    // selected by the SAME (phash, id) rule a full rebuild applies
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-cap").toString
    val base = allEmb.filter(col("vec_id") % 2 === 0)
    val m0full = VectorIndex.publishFrom(spark, base, dir)
    val tiny = m0full.copy(cap = 2L)
    val cent = VectorIndex.loadCentroids(spark, dir)
    VectorIndex.publishWith(spark, base, dir, tiny, cent)
    val m1 = VectorIndex.mergePublish(spark, dir,
      allEmb.filter(col("vec_id") % 2 === 1))
    assert(m1.cap == 2L)
    val widths = VectorIndex.loadBuckets(spark, dir)
      .groupBy("bucket").count().agg(max("count")).collect()(0).getLong(0)
    assert(widths <= 2L, s"a merged bucket holds $widths > cap members")
    // equal to a frozen-geometry rebuild of the union (same rank rule)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-vecidx-cap2").toString
    VectorIndex.publishWith(spark, allEmb, dir2, m1, cent)
    assert(bucketRows(VectorIndex.loadBuckets(spark, dir)) ==
      bucketRows(VectorIndex.loadBuckets(spark, dir2)))

    // the DRAIN case: resubmit every 4th vector with a negated embedding
    // (most change buckets, draining flooded ones). A member the engaged
    // cap dropped earlier must be RE-ADMITTED exactly as a rebuild would
    // — the failure mode of merging the stored (already-truncated)
    // bucket rows instead of re-deriving from the uncapped cell store
    val moved = allEmb.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(-x AS FLOAT))").as("embedding"))
    val m2 = VectorIndex.mergePublish(spark, dir, moved)
    val drained = allEmb.filter(col("vec_id") % 4 =!= 0).unionByName(moved)
    val dir3 = java.nio.file.Files.createTempDirectory("graft-vecidx-cap3").toString
    VectorIndex.publishWith(spark, drained, dir3, m2, cent)
    assert(bucketRows(VectorIndex.loadBuckets(spark, dir)) ==
      bucketRows(VectorIndex.loadBuckets(spark, dir3)),
      "merge after a bucket drain diverged from the frozen-geometry rebuild")
    spark.catalog.clearCache()
  }

  test("limit 0 forces the shuffle path, result-identical to the gated path") {
    // broadcastRowLimit = 0 closes the query-batch hint gate: the batch
    // joins must reach the planner un-hinted — and with auto-broadcast
    // off that is REAL (no size-based rescue at this tiny SF) — and the
    // un-pruned full-index scan must produce exactly the gated rows.
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-gate").toString
    VectorIndex.publishFrom(spark, allEmb, dir)
    val qs = allEmb.filter(col("vec_id") < 10)
    val odd = allEmb.filter(col("vec_id") % 2 === 1)
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshHint = rows(VectorIndex.searchLsh(spark, dir, qs, k = 5))
    val ivfHint = rows(VectorIndex.searchIvf(spark, dir, qs, k = 5, nprobe = 2))
    val probeHint = pairs(VectorIndex.probeBestMatch(spark, dir, odd, 0.45))
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val lshShuf = VectorIndex.searchLsh(spark, dir, qs, k = 5,
        broadcastRowLimit = 0L)
      val p = lshShuf.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"batch still broadcast under limit 0:\n$p")
      assert(lshHint.nonEmpty && rows(lshShuf) == lshHint)
      assert(ivfHint.nonEmpty && rows(VectorIndex.searchIvf(spark, dir, qs,
        k = 5, nprobe = 2, broadcastRowLimit = 0L)) == ivfHint)
      assert(probeHint.nonEmpty && pairs(VectorIndex.probeBestMatch(spark,
        dir, odd, 0.45, broadcastRowLimit = 0L)) == probeHint)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    spark.catalog.clearCache()
  }

  test("published versions keep the hive-partitioned one-file-per-partition layout") {
    // a publish AND a merge must both land buckets/cells hive-partitioned
    // by the key-derived column, one data file per partition directory,
    // values inside the version's recorded layout modulus — the invariant
    // the pruned probe path relies on; a refactor that flattens the
    // layout (or strands loose files beside it) must fail here
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-layout").toString
    VectorIndex.publishFrom(spark, allEmb.filter(col("vec_id") % 2 === 0), dir)
    VectorIndex.mergePublish(spark, dir, allEmb.filter(col("vec_id") % 2 === 1))
    for (v <- Seq("v1", "v2"); ds <- Seq("buckets", "cells")) {
      val pcol = if (ds == "buckets") "bpart=" else "cpart="
      val parts = spark.read.parquet(s"$dir/$v/meta")
        .collect()(0).getAs[Int]("parts")
      val root = new java.io.File(s"$dir/$v/$ds")
      val partDirs = root.listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith(pcol))
      assert(partDirs.nonEmpty, s"$v/$ds has no $pcol hive directories")
      partDirs.foreach { pd =>
        val files = pd.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"$v/$ds/${pd.getName} holds ${files.length} data files, want 1")
        val value = pd.getName.stripPrefix(pcol).toLong
        assert(value >= 0 && value < parts,
          s"$v/$ds/${pd.getName} outside the layout modulus $parts")
      }
      assert(!root.listFiles().exists(f =>
          f.isFile && f.getName.endsWith(".parquet")),
        s"$v/$ds has data files outside partition directories")
    }
    spark.catalog.clearCache()
  }

  test("empty query batches return empty from every search API") {
    // the pruned path derives an EMPTY partition set from an empty batch
    // and must degrade to an empty (not failing) scan — the zero-literal
    // isin edge the gate introduced
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-empty").toString
    VectorIndex.publishFrom(spark, allEmb.filter(col("vec_id") < 50), dir)
    val none = allEmb.filter(col("vec_id") < 0)
    assert(VectorIndex.searchLsh(spark, dir, none, k = 3).count() == 0)
    assert(VectorIndex.searchIvf(spark, dir, none, k = 3, nprobe = 1).count() == 0)
    assert(VectorIndex.probeBestMatch(spark, dir, none, 0.45).count() == 0)
    spark.catalog.clearCache()
  }

  test("needsRebuild flags schedule drift after merges outgrow the geometry") {
    // frozen at a 40-vector schedule, merged to the full corpus: the
    // width/cell schedules would now pick differently -> rebuild due
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-drift").toString
    val tiny = allEmb.filter(col("vec_id") < 40)
    val m0 = VectorIndex.publishFrom(spark, tiny, dir)
    assert(!VectorIndex.needsRebuild(m0))
    val m1 = VectorIndex.mergePublish(spark, dir, allEmb.filter(col("vec_id") >= 40))
    assert(m1.width == m0.width && VectorIndex.needsRebuild(m1))
    spark.catalog.clearCache()
  }
}

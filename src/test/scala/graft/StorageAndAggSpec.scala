package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.sources.StorageOps
import graft.functions.TopKAgg
import graft.operators.CoreOps

class StorageAndAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned sink commits atomically with _SUCCESS and round-trips") {
    val out = Files.createTempDirectory("graft-sink").toString + "/orders"
    val df = Tables.orders(spark, TestSpark.sf0001)
    StorageOps.writePartitioned(df, out, "o_orderstatus")
    assert(StorageOps.isCommitted(spark, out))
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    // partition dirs exist per status value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("o_orderstatus=")))
  }

  test("retention cleanup deletes only expired dirs (ShuffleDataDirClear analog)") {
    val root = Files.createTempDirectory("graft-clean").toString
    val oldDir = Paths.get(root, "app_old"); Files.createDirectory(oldDir)
    val newDir = Paths.get(root, "app_new"); Files.createDirectory(newDir)
    val now = 1000000000L
    Files.setLastModifiedTime(oldDir, java.nio.file.attribute.FileTime.fromMillis(now - 900000))
    Files.setLastModifiedTime(newDir, java.nio.file.attribute.FileTime.fromMillis(now - 100000))
    val deleted = StorageOps.cleanExpired(spark, root, retentionMs = 500000, nowMs = now)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("app_old"))
    assert(!Files.exists(oldDir) && Files.exists(newDir))
  }

  test("compaction merges small files, preserves content, commits atomically") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-compact").toString + "/data"
    // the small-files disease: 40 tiny parquet files for 10k rows
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 7).as("k"))
    df.repartition(40).write.parquet(out)
    val checksumBefore = spark.read.parquet(out)
      .agg(sum(Tables.phash(col("id") + col("k")))).collect()(0).getLong(0)
    val filesBefore = new java.io.File(out).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    // target far above total bytes -> everything compacts into one file
    val (before, after) = StorageOps.compact(spark, out, targetBytes = 1L << 30)
    assert(before == filesBefore && before >= 40)
    assert(after == 1, s"expected 1 data file, got $after")
    assert(StorageOps.isCommitted(spark, out))
    val checksumAfter = spark.read.parquet(out)
      .agg(sum(Tables.phash(col("id") + col("k")))).collect()(0).getLong(0)
    assert(checksumAfter == checksumBefore)
  }

  test("range-sorted layout: per-file key ranges are disjoint; filter pushed") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-rangesort").toString + "/li"
    StorageOps.writeRangeSorted(
      Tables.lineitem(spark, TestSpark.sf0001), dir, "l_orderkey", 4)
    // per-FILE min/max of the sort key must not overlap — the property
    // parquet footer pruning needs to skip whole files on a range scan
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "need multiple files to prove disjointness")
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"file ranges overlap: ${ranges.mkString(",")}")
    }
    // the range predicate reaches the scan as a pushed filter
    val scan = spark.read.parquet(dir).filter(col("l_orderkey") < 100)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"),
      s"range filter not pushed:\n$scan")
    // content round-trips
    assert(spark.read.parquet(dir).count() ==
      Tables.lineitem(spark, TestSpark.sf0001).count())
  }

  test("TopKAgg matches the window row_number() top-k formulation") {
    import spark.implicits._
    // revenue per (nation, supplier), same as q_topk's input
    val rev = Tables.lineitem(spark, TestSpark.sf0001)
      .join(broadcast(Tables.supplier(spark, TestSpark.sf0001)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
    val viaAgg = rev.select(col("s_nationkey"), col("revenue"), col("s_suppkey"))
      .as[(Int, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAgg(3).toColumn.name("top"))
      .flatMap { case (nation, buf) =>
        buf.ids.zipWithIndex.map { case (id, i) => (nation, id, i + 1) }
      }
      .collect().toSet
    val viaWindow = CoreOps.queries("q_topk")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("versioned publish: pointer flip swaps whole versions; prune keeps the active one") {
    import spark.implicits._
    import graft.sources.StorageOps
    val dir = java.nio.file.Files.createTempDirectory("graft-vpub").toString + "/tbl"
    val v1 = StorageOps.publishVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    assert(v1 == 1 && StorageOps.currentVersion(spark, dir).contains("v1"))
    assert(StorageOps.loadPublished(spark, dir).collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L)))
    val v2 = StorageOps.publishVersioned(Seq((3L, "c")).toDF("k", "v"), dir)
    assert(v2 == 2 && StorageOps.currentVersion(spark, dir).contains("v2"))
    // readers now see v2 in full; v1 is intact until pruned (a reader
    // mid-scan on v1 keeps a consistent dataset)
    assert(StorageOps.loadPublished(spark, dir).collect().map(_.getLong(0))
      .sameElements(Array(3L)))
    assert(spark.read.parquet(s"$dir/v1").count() == 2)
    val pruned = StorageOps.pruneVersions(spark, dir, keep = 1)
    assert(pruned == Seq("v1"), s"got $pruned")
    assert(StorageOps.loadPublished(spark, dir).count() == 1)
  }

  test("object-store committer conf is scheme-scoped and inert for local writes") {
    import spark.implicits._
    import graft.sources.StorageOps
    val conf = StorageOps.objectStoreCommitterConf()
    // the two load-bearing choices: factory routing + the routing protocol
    assert(conf.keys.exists(_.contains("outputcommitter.factory.scheme.s3a")))
    assert(conf.get("spark.hadoop.fs.s3a.committer.name").contains("magic"))
    assert(conf.get("spark.sql.sources.commitProtocolClass")
      .contains("graft.sources.SchemeRoutedCommitProtocol"))
    // scheme-scoped: with the FULL conf applied (including the routing
    // protocol), a file:// parquet write still falls through to the stock
    // committer and commits fine (no s3a jars in this sandbox — exactly
    // the situation the scoping must survive).
    val hc = spark.sparkContext.hadoopConfiguration
    val saved = conf.collect { case (k, _) if k.startsWith("spark.hadoop.") =>
      (k.stripPrefix("spark.hadoop."), Option(hc.get(k.stripPrefix("spark.hadoop."))))
    }
    StorageOps.configureObjectStoreCommitter(spark)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-oscc").toString + "/t"
      Seq((1L, "x")).toDF("k", "v").write.parquet(dir)
      assert(StorageOps.isCommitted(spark, dir), "local write must still commit")
      assert(spark.read.parquet(dir).count() == 1)
    } finally {
      saved.foreach {
        case (k, Some(v)) => hc.set(k, v)
        case (k, None) => hc.unset(k)
      }
      spark.conf.unset("spark.sql.sources.commitProtocolClass")
    }
  }

  /** Run `body` with the rename-forbidding mocks3:// store registered,
    * rooted at a fresh temp dir; restores the Hadoop conf afterwards. */
  private def withMockS3(body: String => Unit): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    hc.set("fs.mocks3.impl.disable.cache", "true")
    try body("mocks3://" + Files.createTempDirectory("graft-mocks3").toString)
    finally { hc.unset("fs.mocks3.impl"); hc.unset("fs.mocks3.impl.disable.cache") }
  }

  test("negative control: the stock rename-based committer FAILS on the rename-forbidding store") {
    import spark.implicits._
    withMockS3 { base =>
      val e = intercept[Throwable] {
        Seq((1L, "x")).toDF("k", "v").write.parquet(s"$base/plain")
      }
      // the failure must be the forbidden rename, not something incidental
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain.exists(t => t.isInstanceOf[UnsupportedOperationException] ||
        Option(t.getMessage).exists(_.contains("mocks3: rename"))),
        s"expected forbidden-rename failure, got: $e")
    }
  }

  test("scheme-routed commit + versioned publish run end-to-end on the rename-forbidding store") {
    import spark.implicits._
    import graft.sources.StorageOps
    withMockS3 { base =>
      val hc = spark.sparkContext.hadoopConfiguration
      val factoryKey = "mapreduce.outputcommitter.factory.scheme.mocks3"
      StorageOps.configureObjectStoreCommitter(spark, scheme = "mocks3",
        factory = classOf[graft.sources.DirectPutCommitterFactory].getName)
      try {
        // (b) the factory key is what routes commits: the SAME write that
        // failed above now commits, with zero renames anywhere
        Seq((1L, "x"), (2L, "y")).toDF("k", "v").write.parquet(s"$base/t")
        assert(StorageOps.isCommitted(spark, s"$base/t"),
          "_SUCCESS must be written by the rename-free committer")
        assert(spark.read.parquet(s"$base/t").count() == 2)
        // partitioned layout too: task files land directly under their
        // partition directories — still zero renames
        Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "a", "z"))
          .toDF("k", "part", "v")
          .write.partitionBy("part").parquet(s"$base/pt")
        assert(spark.read.parquet(s"$base/pt").count() == 3)
        assert(spark.read.parquet(s"$base/pt")
          .filter(col("part") === "a").count() == 2)
        // (a) the full publish cycle on the object store: immutable
        // version dirs + single-PUT pointer flips + retention prune
        val tbl = s"$base/tbl"
        val v1 = StorageOps.publishVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tbl)
        assert(v1 == 1 && StorageOps.currentVersion(spark, tbl).contains("v1"))
        assert(StorageOps.loadPublished(spark, tbl).count() == 2)
        val v2 = StorageOps.publishVersioned(Seq((3L, "c")).toDF("k", "v"), tbl)
        assert(v2 == 2 && StorageOps.currentVersion(spark, tbl).contains("v2"))
        assert(StorageOps.loadPublished(spark, tbl)
          .collect().map(_.getLong(0)).sameElements(Array(3L)))
        assert(spark.read.parquet(s"$tbl/v1").count() == 2, "v1 intact until pruned")
        assert(StorageOps.pruneVersions(spark, tbl, keep = 1) == Seq("v1"))
        assert(StorageOps.loadPublished(spark, tbl).count() == 1)
        // versioned compaction: the object-store-safe small-files remedy —
        // many-file version rewritten as one-file next version, pointer
        // flipped, zero renames, content preserved
        val ct = s"$base/ctbl"
        StorageOps.publishVersioned(
          spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
            .repartition(8), ct)
        val sumBefore = StorageOps.loadPublished(spark, ct)
          .agg(sum(col("id") + col("k"))).head().getLong(0)
        val (nb, na, nv) = StorageOps.compactVersioned(spark, ct, 1L << 30)
        assert(nb == 8 && na == 1 && nv == 2, s"got ($nb, $na, $nv)")
        assert(StorageOps.currentVersion(spark, ct).contains("v2"))
        assert(StorageOps.loadPublished(spark, ct)
          .agg(sum(col("id") + col("k"))).head().getLong(0) == sumBefore)
      } finally {
        hc.unset(factoryKey)
        hc.unset("fs.mocks3.committer.name")
        hc.unset("fs.mocks3.committer.magic.enabled")
        spark.conf.unset("spark.sql.sources.commitProtocolClass")
      }
    }
  }

  test("z-order layout prunes on BOTH axes where single-key sort leaves one unprunable") {
    import spark.implicits._
    import graft.sources.StorageOps
    import org.apache.hadoop.fs.Path
    // two uniform 0..199 keys, decorrelated
    val df = spark.range(0, 40000).select(
      (col("id") % 200).as("a"), (col("id") * 7919 % 200).as("b"),
      col("id").as("v"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    StorageOps.writeRangeSorted(df, s"$base/linear", "a", 16)
    StorageOps.writeZOrdered(df, s"$base/zorder", "a", "b", 16, bits = 8)
    def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        .map { f =>
          val r = spark.read.parquet(f.getPath.toString)
            .agg(min("a"), max("a"), min("b"), max("b")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }.toSeq
    }
    // a scan filtered on b alone: count files whose footer b-range
    // intersects [100, 119] (the files a min/max-pruning reader must open)
    def bHits(boxes: Seq[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, bmin, bmax) => bmax >= 100 && bmin <= 119 }
    val linear = fileBoxes(s"$base/linear")
    val zorder = fileBoxes(s"$base/zorder")
    assert(linear.size == 16 && zorder.size == 16)
    // single-key layout: every file spans the whole b range — nothing prunes
    assert(bHits(linear) == 16, s"linear: ${bHits(linear)}")
    // z-order: files are rectangles, most miss the 10% b-band
    assert(bHits(zorder) <= 8, s"zorder files hit on b: ${bHits(zorder)}")
    // and the a-axis still prunes to at most half the files for a 10% band
    val aHits = zorder.count { case (amin, amax, _, _) => amax >= 40 && amin <= 59 }
    assert(aHits <= 8, s"zorder files hit on a: $aHits")
    // layouts carry identical data
    assert(spark.read.parquet(s"$base/zorder").agg(sum("v")).head().getLong(0) ==
      spark.read.parquet(s"$base/linear").agg(sum("v")).head().getLong(0))
  }

  test("observe() exposes scan metrics (Ors2MetricsExport analog)") {
    val obs = new org.apache.spark.sql.Observation("lineitem-scan")
    Tables.lineitem(spark, TestSpark.sf0001)
      .observe(obs, count(lit(1)).as("rows"), sum("l_quantity").as("qty"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] == 6000L)
    assert(m("qty").asInstanceOf[Double] > 0)
  }
}

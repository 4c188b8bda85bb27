package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipeOps
import graft.sources.PipeFiles

/** The native pipe format + DSv2 connector (SURVEY §2A #21-26 over the
  * reference's OWN file layout): bit-level write/read roundtrip, the
  * finalize/torn-file contract, planning-time partition pruning proven
  * PHYSICAL (a poisoned pruned directory is never opened), byte-level
  * column pruning, and the cleaning pipeline + checksum verdicts against
  * independently derived ground truth. */
class PipeSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pipe-$tag").toString

  private def readPipe(dir: String) =
    spark.read.format(PipeOps.Source).load(dir)

  private def writeRows(dir: String, rows: Seq[(Int, Int, Long, Int, String)],
      overwrite: Boolean = true): Unit = {
    import spark.implicits._
    val df = rows.toDF("partition_id", "map_id", "attempt_id", "seq_id", "ptxt")
      .select(col("partition_id"), col("map_id"), col("attempt_id"),
        col("seq_id"), encode(col("ptxt"), "UTF-8").as("payload"))
    PipeFiles.write(df, dir, overwrite)
  }

  test("roundtrip: data rows, ledger rows, and the _SUCCEED marker") {
    val dir = freshDir("rt")
    // map 1 retried (attempts 0+1 share seqs), one resend dup at seq 1
    writeRows(dir, Seq(
      (0, 1, 0L, 1, "alpha"), (0, 1, 0L, 2, "beta"),
      (0, 1, 1L, 1, "alpha"), (0, 1, 1L, 2, "beta"),
      (0, 1, 1L, 1, "alpha"), // resend duplicate of (attempt 1, seq 1)
      (0, 2, 0L, 1, "gamma"),
      (3, 7, 0L, 1, "delta")))
    val got = readPipe(dir)

    val data = got.filter(col("checksum").isNull)
      .select("partition_id", "map_id", "attempt_id", "seq_id", "length", "payload")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), new String(r.getAs[Array[Byte]](5), "UTF-8")))
      .toSeq.sorted
    assert(data === Seq(
      (0, 1, 0L, 1, 5L, "alpha"), (0, 1, 0L, 2, 4L, "beta"),
      (0, 1, 1L, 1, 5L, "alpha"), (0, 1, 1L, 1, 5L, "alpha"),
      (0, 1, 1L, 2, 4L, "beta"),
      (0, 2, 0L, 1, 5L, "gamma"), (3, 7, 0L, 1, 5L, "delta")))

    // stored ledgers: latest attempt, each seq once — resend not double-counted
    def crc(s: String) = PipeFiles.crc32Of(s.getBytes("UTF-8"))
    val ledger = got.filter(col("checksum").isNotNull)
      .select("partition_id", "map_id", "attempt_id", "checksum")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(ledger === Seq(
      (0, 1, 1L, crc("alpha") + crc("beta")),
      (0, 2, 0L, crc("gamma")),
      (3, 7, 0L, crc("delta"))))

    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(dir, PipeFiles.SucceedMarker)))
  }

  test("torn .dat files are invisible; torn .dat_final fails loudly") {
    val dir = freshDir("torn")
    writeRows(dir, Seq((1, 0, 0L, 1, "keep")))
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // a crashed writer's un-finalized file: ignored
    val torn = fs.create(new Path(s"$dir/1/shuffle_crashed_1.dat"), true)
    torn.write(Array.fill[Byte](11)(42)); torn.close()
    assert(readPipe(dir).count() === 2) // 1 data + 1 ledger row

    // a FINALIZED file that ends mid-record: corruption, must surface
    val bad = fs.create(new Path(s"$dir/1/shuffle_bad_1.dat_final"), true)
    bad.write(Array.fill[Byte](11)(42)); bad.close()
    val ex = intercept[Exception](readPipe(dir).count())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(ex).exists(_.contains("torn")), chain(ex).mkString("\n"))
  }

  test("partition_id pushdown prunes directories physically") {
    val dir = freshDir("prune")
    writeRows(dir, Seq((1, 0, 0L, 1, "one"), (7, 0, 0L, 1, "seven")))
    // poison partition 7: pruned reads never open it, full reads die
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val bad = fs.create(new Path(s"$dir/7/shuffle_poison_7.dat_final"), true)
    bad.write(Array.fill[Byte](40)(-1)); bad.close()

    val pruned = readPipe(dir).filter(col("partition_id") === 1)
    assert(pruned.count() === 2)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("EqualTo(partition_id,1)"),
      "pushed partition filter missing from the scan description")
    intercept[Exception](readPipe(dir).count())
    // range pruning too
    assert(readPipe(dir).filter(col("partition_id") < 7).count() === 2)
    assert(readPipe(dir)
      .filter(col("partition_id").isin(0, 1, 2)).count() === 2)
  }

  test("column pruning reaches the scan (payload never read)") {
    val dir = freshDir("prunecol")
    writeRows(dir, Seq((0, 0, 0L, 1, "payload-bytes")))
    val slim = readPipe(dir).select("partition_id", "length")
    val scanStr = slim.queryExecution.executedPlan.toString
    assert(scanStr.contains("ReadSchema: struct<partition_id:int,length:bigint>")
      || !scanStr.contains("payload"),
      s"payload not pruned from scan:\n$scanStr")
    assert(slim.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      === Seq((0, 13L), (0, 0L)))
    // behavioral proof: poison the payload BYTES of a finalized file but
    // keep framing intact — lineage-only reads stay exact (they seek past
    // the garbage); full reads also succeed (payload is opaque binary)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.listStatus(new Path(s"$dir/0"))
      .filter(_.getPath.getName.endsWith(PipeFiles.FinalSuffix)).head
    val bytes = new Array[Byte](st.getLen.toInt)
    val in = fs.open(st.getPath); in.readFully(bytes); in.close()
    java.util.Arrays.fill(bytes, PipeFiles.IndexNumBytes,
      PipeFiles.IndexNumBytes + 13, 0: Byte)
    val out = fs.create(st.getPath, true); out.write(bytes); out.close()
    assert(readPipe(dir).select("partition_id", "length").count() === 2)
  }

  test("fixture: cleaning pipeline recovers the logical set; ledger flags the planted fault") {
    val d = sf
    val logical = PipeOps.pipeRows(spark, d)
      .filter(col("attempt_id") === 0).dropDuplicates("partition_id", "map_id", "seq_id")
    val expectBlocks = logical.groupBy("partition_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap

    val latest = SparkEntry.queries("q_pipe_latest")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(latest === expectBlocks)

    val verify = SparkEntry.queries("q_pipe_checksum_verify")(spark, d)
    val badGroups = verify.filter(!col("ok"))
      .select("partition_id", "map_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(badGroups === Seq((2, 5)),
      s"exactly the planted (2,5) corruption must be flagged, got $badGroups")
    // precondition: the group grid genuinely exists at this SF
    // (sf0.001 has 10 suppliers → 8 pids × 10 mids)
    assert(verify.count() >= 50)
  }

  test("checksum verify survives an attempt-superseding append wave") {
    // a retried map re-sent in a LATER wave: the superseded attempt's
    // file still carries its own ledger record, which the verify must
    // discard exactly as the reference's reader does — summing it in
    // would flag every cross-wave retry as corruption
    val dir = freshDir("waves")
    writeRows(dir, Seq((0, 1, 0L, 1, "alpha"), (0, 1, 0L, 2, "beta"),
      (0, 2, 0L, 1, "gamma")))
    writeRows(dir, Seq((0, 1, 1L, 1, "alpha"), (0, 1, 1L, 2, "beta")),
      overwrite = false)
    val rows = readPipe(dir)
    // two ledger records for map 1 (one per wave) — only attempt 1 counts
    assert(rows.filter(col("checksum").isNotNull &&
      col("map_id") === 1).count() === 2)
    val verify = rows.filter(col("checksum").isNull)
    val data = verify.select("partition_id", "map_id", "attempt_id")
    assert(data.filter(col("map_id") === 1 && col("attempt_id") === 1)
      .count() === 2)
    // drive the registered query shape over this tree via the same ops:
    // recompute inline (the registered query is bound to the fixture dir)
    import org.apache.spark.sql.functions.{max => fmax, sum => fsum}
    val d2 = rows.filter(col("checksum").isNull)
      .select("partition_id", "map_id", "attempt_id", "seq_id", "payload")
    val latest = d2.groupBy("partition_id", "map_id")
      .agg(fmax(col("attempt_id")).as("attempt_id"))
    val computed = d2.join(latest, Seq("partition_id", "map_id", "attempt_id"))
      .dropDuplicates("partition_id", "map_id", "attempt_id", "seq_id")
      .groupBy("partition_id", "map_id")
      .agg(fsum(crc32(col("payload"))).as("computed"))
    val stored = rows.filter(col("checksum").isNotNull)
      .join(latest, Seq("partition_id", "map_id", "attempt_id"))
      .groupBy("partition_id", "map_id")
      .agg(fsum(col("checksum")).as("stored"))
    val verdicts = computed.join(stored, Seq("partition_id", "map_id"))
      .select(col("map_id"), (col("computed") === col("stored")).as("ok"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1))).toMap
    assert(verdicts === Map(1 -> true, 2 -> true),
      s"cross-wave retry must verify clean, got $verdicts")
  }

  test("payload IO is a measured SQL metric, not a doc claim") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = freshDir("metrics")
    writeRows(dir, Seq((0, 0, 0L, 1, "twelve-bytes"), (0, 0, 0L, 2, "four")))
    def scanMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b }.get
      scan.metrics.map { case (k, m) => k -> m.value }
    }
    // pruned scan: every payload byte seeked past, none read
    val slim = scanMetrics(readPipe(dir).select("partition_id", "length"))
    assert(slim("payloadBytesSkipped") === 16L, slim.toString)
    assert(slim("payloadBytesRead") === 0L)
    // full scan: every payload byte read, none skipped
    val full = scanMetrics(readPipe(dir))
    assert(full("payloadBytesRead") === 16L, full.toString)
    assert(full("payloadBytesSkipped") === 0L)
  }

  test("requireCommitted gates the batch read on the job marker") {
    val dir = freshDir("committed")
    writeRows(dir, Seq((0, 0, 0L, 1, "done")))
    def committedRead =
      spark.read.format(PipeOps.Source).option("requireCommitted", "true")
        .load(dir)
    assert(committedRead.count() === 2)
    // a half-committed job: finalized files exist, marker doesn't
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(dir, PipeFiles.SucceedMarker), false)
    val ex = intercept[Exception](committedRead.count())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(ex).exists(_.contains("not committed")), chain(ex).mkString("\n"))
    // the default read stays available (the streaming / live-tree case)
    assert(readPipe(dir).count() === 2)
  }

  test("runtime filtering (DPP) prunes directories at execution time") {
    val dir = freshDir("dpp")
    writeRows(dir, Seq((1, 0, 0L, 1, "one"), (2, 0, 0L, 1, "two"),
      (7, 0, 0L, 1, "seven")))
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val bad = fs.create(new Path(s"$dir/7/shuffle_poison_7.dat_final"), true)
    bad.write(Array.fill[Byte](40)(-1)); bad.close()

    // the DSv2 runtime-filter contract, driven directly: an IN-set
    // arriving at execution time must shrink the planned partitions
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.sources.In
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    val tbl = new graft.sources.PipeDataSource()
      .getTable(PipeFiles.schema, Array.empty, opts.asCaseSensitiveMap())
    val scan = tbl.asInstanceOf[SupportsRead].newScanBuilder(opts).build()
    assert(scan.toBatch.planInputPartitions().length === 4) // 3 + poison
    scan.asInstanceOf[SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](
        In("partition_id", Array(1, 2))))
    assert(scan.toBatch.planInputPartitions().length === 2,
      "runtime IN-set must prune the poisoned directory")

    // end-to-end: a broadcast join against a selective dim plans dynamic
    // pruning on the scan, so the poisoned dir 7 is never opened even
    // though no static partition_id predicate exists
    import spark.implicits._
    // the dim must survive optimization as a real scan + Filter — a
    // LocalRelation folds its filter away and the pruning rule then sees
    // no selective predicate on the filtering side
    val dimDir = freshDir("dim")
    Seq((1, "a"), (2, "b"), (3, "c"), (7, "x"))
      .toDF("pid", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    withDppConf {
      val joined = readPipe(dir).filter(col("checksum").isNull)
        .join(dim.filter(col("tag") < "c"), col("partition_id") === col("pid"))
      // the COUNT is the physical proof: without runtime pruning the scan
      // opens poisoned dir 7 and throws — the join predicate alone cannot
      // save it (rows filter after the read)
      assert(joined.count() === 2) // pids 1, 2 — dir 7 pruned at runtime
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamic pruning subquery on the pipe scan:\n$plan")
    }
  }

  private def withDppConf[T](body: => T): T = {
    // at fixture scale the benefit heuristic (size-based) never fires; pin
    // the DECISION inputs so the test exercises the mechanism: trust the
    // fallback ratio instead of stats, and don't require broadcast reuse
    val pins = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000.0")
    val prev = pins.map { case (k, _) => k -> spark.conf.get(k) }
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("micro-batch stream: each finalized file wave exactly once") {
    val dir = freshDir("stream")
    writeRows(dir, Seq((0, 0, 0L, 1, "first")))
    val stream = spark.readStream.format(PipeOps.Source).load(dir)
      .filter(col("checksum").isNull)
      .select("partition_id", "map_id", "seq_id", "length")
    val ckpt = freshDir("ckpt")
    // foreachBatch sink: supports checkpoint RECOVERY (the memory sink
    // does not), so the restart leg below exercises deserializeOffset
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    def startQ() = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("partition_id").collect().foreach(r => got.add(r.getInt(0)))
        ()
      }.start()
    val query = startQ()
    try {
      query.processAllAvailable()
      assert(got.toArray.toSeq === Seq(0))
      // a second write wave finalizes new files → exactly the new rows
      writeRows(dir, Seq((1, 0, 0L, 1, "second"), (2, 3, 0L, 1, "third")),
        overwrite = false)
      query.processAllAvailable()
      assert(got.toArray.map(_.asInstanceOf[Int]).sorted.toSeq === Seq(0, 1, 2))
      // idle poll: nothing re-emitted (the wait-for-finalize loop sees
      // no new finalized pipes)
      query.processAllAvailable()
      assert(got.size === 3)
    } finally query.stop()

    // RESTART from the checkpoint: the committed offset round-trips
    // through its JSON form (deserializeOffset) and only files finalized
    // after it are emitted
    writeRows(dir, Seq((3, 0, 0L, 1, "fourth")), overwrite = false)
    got.clear()
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(got.toArray.toSeq === Seq(3),
        "a restarted stream must resume AFTER the committed file set")
    } finally q2.stop()
  }

  test("q_pipe_scan prunes partitions and counts the raw physical stream") {
    val d = sf
    val raw = PipeOps.pipeRows(spark, d).filter(col("partition_id") < 4)
    val expect = raw.groupBy("partition_id")
      .agg(count(lit(1)).as("b"), sum(length(col("payload")).cast("long")).as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val got = SparkEntry.queries("q_pipe_scan")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === expect)
  }
}

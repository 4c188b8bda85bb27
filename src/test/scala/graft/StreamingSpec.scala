package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Sessionize
import graft.streaming.Sessionize.Ev
import graft.operators.CoreOps

/** Streaming sessionization must agree with the batch window query and
  * maintain state across micro-batches. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val gapUs = 1800000000L // 30 min, matches q_window_session

  test("batch-mode sessionize matches q_window_session on sf0.001") {
    import spark.implicits._
    val evs = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id").as("userId"), expr("ts div 1000").as("tsUs"))
      .as[Ev]
    val got = Sessionize.sessionize(evs, gapUs)
      .collect().map(u => (u.userId, u.nSessions, u.nEvents)).toSet
    val want = CoreOps.queries("q_window_session")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("state persists across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = Sessionize.sessionize(source.toDS(), gapUs = 100L)
      .writeStream.format("memory").queryName("sess").outputMode("update").start()
    try {
      // batch 1: two events 50us apart -> one session
      source.addData(Ev(1L, 1000L), Ev(1L, 1050L))
      q.processAllAvailable()
      // batch 2: gap of 500us -> second session opens for the same key
      source.addData(Ev(1L, 1550L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.contains((1L, 1L, 2L)), s"batch-1 state wrong: ${rows.mkString(",")}")
      assert(rows.contains((1L, 2L, 3L)), s"batch-2 state wrong: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("streaming dedup drops resends within the watermark horizon") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = Sessionize.dedupStream(source.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      source.addData(Ev(1L, 1000L), Ev(1L, 1000L), Ev(1L, 2000L)) // dup in batch
      q.processAllAvailable()
      source.addData(Ev(1L, 1000L), Ev(2L, 1000L)) // resend across batches
      q.processAllAvailable()
      val rows = spark.sql("SELECT userId, tsUs FROM dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.distinct.length, s"dups survived: ${rows.mkString(",")}")
      assert(rows.toSet == Set((1L, 1000L), (1L, 2000L), (2L, 1000L)))
    } finally q.stop()
  }

  test("dedup state survives a checkpointed stop/restart (exactly-once resume)") {
    // The recovery contract a production stream lives on: stop the query,
    // restart from the SAME checkpoint, and the state store must remember
    // every fingerprint it admitted — a resend arriving after the restart
    // is dropped, not re-emitted. This is the engine-side counterpart of
    // the reference's exactly-once block ledger (dedup on re-delivery
    // after reconnect), where the \"reconnect\" is a whole query restart.
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.CurationStream
    import graft.streaming.CurationStream.TimedDoc
    // the memory sink cannot recover from a checkpoint; the parquet file
    // sink is the fault-tolerant one, so the output itself rides the same
    // exactly-once machinery the test exercises
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString
    val d1 = TimedDoc(1L, "en", "alpha beta gamma delta", 86400000000L)
    val d2 = TimedDoc(2L, "en", "epsilon zeta eta theta", 86401000000L)
    val dup1 = TimedDoc(3L, "en", "alpha beta gamma delta", 86402000000L)
    val d4 = TimedDoc(4L, "en", "iota kappa lambda mu", 86403000000L)
    def emitted(): Set[Long] =
      spark.read.parquet(out).select("docId").collect().map(_.getLong(0)).toSet

    val source1 = MemoryStream[TimedDoc]
    val q1 = CurationStream.dedupByFingerprint(source1.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      source1.addData(d1, d2)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emitted() == Set(1L, 2L))

    // restart: NEW source, SAME checkpoint. A MemoryStream checkpoint
    // resumes at the recorded offset, so the new source must replay batch
    // 0 (arbitrary data is fine — it is skipped as committed) before the
    // post-restart arrivals land in batch 1.
    val source2 = MemoryStream[TimedDoc]
    source2.addData(d1, d2) // placeholder for the committed batch 0
    val q2 = CurationStream.dedupByFingerprint(source2.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      source2.addData(dup1, d4) // dup of a PRE-restart doc + a fresh doc
      q2.processAllAvailable()
      assert(!emitted().contains(3L),
        "fingerprint state was lost across the restart: resend re-admitted")
      assert(emitted() == Set(1L, 2L, 4L), "fresh doc must still pass, once")
    } finally q2.stop()
  }

  test("watermarked windowed rate runs on a stream") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = Sessionize.windowedRate(spark, source.toDS())
      .writeStream.format("memory").queryName("rate").outputMode("update").start()
    try {
      source.addData(Ev(7L, 0L), Ev(7L, 1000000L), Ev(8L, 2000000L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM rate").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(rows.toSet == Set((7L, 2L), (8L, 1L)), rows.mkString(","))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDS()
    val source = MemoryStream[Ev]
    val q = Sessionize.enrichStream(source.toDS(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      source.addData(Ev(1L, 10L), Ev(3L, 20L)) // user 3 not in dim -> dropped
      q.processAllAvailable()
      source.addData(Ev(2L, 30L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM enrich").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.toSet == Set((1L, 10L, "gold"), (2L, 30L, "basic")),
        rows.mkString(","))
    } finally q.stop()
  }

  test("streaming curation applies the exact batch quality+sample rules") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.CurationStream
    import graft.streaming.CurationStream.Doc
    // run the SAME docs through batch curate() and a MemoryStream —
    // decisions must be identical row for row
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id").as("docId"), col("lang"), col("text"))
      .as[Doc].collect().toSeq.take(100)
    val batch = CurationStream.curate(spark.createDataset(docs))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(3), r.getBoolean(4))).toMap
    val source = MemoryStream[Doc]
    val q = CurationStream.curate(source.toDS())
      .writeStream.format("memory").queryName("curated").outputMode("append").start()
    try {
      source.addData(docs.take(50): _*)
      q.processAllAvailable()
      source.addData(docs.drop(50): _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM curated").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(3), r.getBoolean(4))).toMap
      assert(streamed == batch)
      // the hash-sample split must be non-degenerate in both directions
      assert(streamed.values.exists(_._2) && streamed.values.exists(!_._2))
    } finally q.stop()
  }

  test("streaming chunker emits exactly the batch q_chunk rows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.CurationStream
    import graft.streaming.CurationStream.Doc
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id").as("docId"), col("lang"), col("text"))
      .as[Doc].collect().toSeq.take(80)
    val batch = operators.TextOps.queries("q_chunk")(spark, TestSpark.sf0001)
      .filter(col("doc_id").isin(docs.map(_.docId): _*))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4))).toSet
    val source = MemoryStream[Doc]
    val q = CurationStream.chunkStream(source.toDS())
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    try {
      source.addData(docs.take(40): _*)
      q.processAllAvailable()
      source.addData(docs.drop(40): _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM chunks").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getString(4))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("curation quality decisions equal q_quality_filter's reasons==0 counts") {
    import spark.implicits._
    import graft.streaming.CurationStream
    import graft.streaming.CurationStream.Doc
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id").as("docId"), col("lang"), col("text")).as[Doc]
    val curated = CurationStream.curate(docs)
      .groupBy("lang")
      .agg(sum(col("qualityOk").cast("long")).as("n_ok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaBitmask = operators.PipelineOps.queries("q_quality_filter")(
        spark, TestSpark.sf0001)
      .filter(col("reasons") === 0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(curated.filter(_._2 > 0) == viaBitmask.filter(_._2 > 0))
  }

  test("streaming fingerprint dedup matches the batch exact-dedup keepers") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.CurationStream
    import graft.streaming.CurationStream.TimedDoc
    // event times must sit ABOVE the initial watermark (epoch 0): a row
    // whose event time <= watermark is late and silently dropped, so a
    // ts=0 first arrival would never register dedup state
    val t0 = 1000000000L * 1000000L // 2001-09-09, safely past epoch 0
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().sortBy(_.getLong(0)).take(100)
      .zipWithIndex.map { case (r, i) =>
        TimedDoc(r.getLong(0), r.getString(1), r.getString(2), t0 + i * 1000000L) }
    // plant a cross-batch exact duplicate: same text, later arrival
    val dup = base.head.copy(docId = 999999L, tsUs = t0 + 200 * 1000000L)
    val docs = base :+ dup
    // batch keeper set: min doc_id per fingerprint — the funnel's exact_ok
    val keepers = spark.createDataset(docs.toSeq)
      .select(Tables.fingerprint(col("text")).as("fp"), col("docId"))
      .groupBy("fp").agg(min("docId").as("keep"))
      .collect().map(_.getLong(1)).toSet
    val source = MemoryStream[TimedDoc]
    val q = CurationStream.dedupByFingerprint(source.toDS())
      .writeStream.format("memory").queryName("fpdedup").outputMode("append").start()
    try {
      // arrival follows doc_id order -> first-arrived == min doc_id and
      // the streaming decisions must equal the batch keeper set exactly
      source.addData(docs.take(60): _*)
      q.processAllAvailable()
      source.addData(docs.drop(60): _*)
      q.processAllAvailable()
      val kept = spark.sql("SELECT docId FROM fpdedup").collect()
        .map(_.getLong(0)).toSet
      assert(!kept.contains(999999L), "cross-batch duplicate must be dropped")
      assert(kept == keepers)
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to in-window clicks") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t0 = 1000000000L * 1000000L // past epoch 0 (initial-watermark trap)
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Sessionize.attributeStream(clicks.toDS(), purchases.toDS(),
        windowUs = 600000000L) // 10 min
      .toDF("user", "pTs", "cTs")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      // user 1: click at t0, purchase 5 min later (inside window);
      // user 2: click at t0, purchase 20 min later (outside window);
      // user 3: purchase with no click at all
      clicks.addData(Ev(1L, t0), Ev(2L, t0))
      purchases.addData(Ev(1L, t0 + 300000000L))
      q.processAllAvailable()
      purchases.addData(Ev(2L, t0 + 1200000000L), Ev(3L, t0 + 60000000L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user, pTs, cTs FROM attr").collect()
        .map(r => (r.getLong(0), r.getLong(1) - t0, r.getLong(2) - t0)).toSet
      // only user 1's purchase joins: cross-batch (click arrived a batch
      // earlier, held in the join state), inside the 10-min bound
      assert(rows == Set((1L, 300000000L, 0L)), rows.mkString(","))
    } finally q.stop()
  }

  test("deterministic stream sampling matches the batch hash rule") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val evs = (1L to 200L).map(i => Ev(i, i * 10))
    val source = MemoryStream[Ev]
    val q = Sessionize.sampleStream(source.toDS(), 20)
      .writeStream.format("memory").queryName("samp").outputMode("append").start()
    try {
      source.addData(evs: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT userId FROM samp").collect().map(_.getLong(0)).toSet
      val want = evs.map(_.userId).filter(id =>
        ((id % 1000000007L) * 2654435761L) % 1000000007L % 100 < 20).toSet
      assert(got == want)
      assert(got.nonEmpty && got.size < evs.size)
    } finally q.stop()
  }
}

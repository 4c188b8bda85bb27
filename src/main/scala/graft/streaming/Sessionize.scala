package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogs of the worker-health semantics the reference's master
  * tracks over heartbeats (ShuffleWorkerStatusManager.java:75-130): gap-based
  * sessionization with custom state (flatMapGroupsWithState) and a
  * watermarked tumbling-window rate aggregation.
  *
  * The reference is batch-only (SURVEY.md §1 "Streams: none") — this module
  * is the north-star extension, matching the batch `q_window_session`
  * semantics so the two can be cross-checked.
  *
  * Scale notes: state is one small case class per user/worker key; the
  * stateful shuffle partitions by key (RocksDB state store at real scale).
  * Events are processed in event-time order within a batch; cross-batch
  * out-of-order data is handled in production by the watermark delaying
  * window finalization — the custom-state path documents that its `lastTs`
  * monotonicity assumes per-key ordered arrival (true for heartbeats).
  */
object Sessionize {
  case class Ev(userId: Long, tsUs: Long)
  case class SessState(lastTs: Long, sessions: Long, events: Long)
  case class UserSessions(userId: Long, nSessions: Long, nEvents: Long)

  /** Heartbeat-gap session counter: gap > gapUs opens a new session —
    * the "expired worker" predicate of ShuffleWorkerStatusManager.java:90-95. */
  def update(gapUs: Long)(
      userId: Long, evs: Iterator[Ev], state: GroupState[SessState]): Iterator[UserSessions] = {
    // tsUs only: userId is the group key (constant here), and equal-ts
    // events are order-insensitive for gap counting — there is no real
    // secondary order and pretending otherwise would overstate determinism
    val sorted = evs.toArray.sortBy(_.tsUs)
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val newSess = st.lastTs == Long.MinValue || e.tsUs - st.lastTs > gapUs
      st = SessState(e.tsUs, st.sessions + (if (newSess) 1L else 0L), st.events + 1L)
    }
    state.update(st)
    Iterator(UserSessions(userId, st.sessions, st.events))
  }

  /** Works on both streaming and batch Datasets (batch = one big group). */
  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        update(gapUs))
  }

  /** Streaming exactly-once dedup: the reference reader's (mapId, seqId)
    * duplicate guard (ShufflePartitionReader.java:378-393) in streaming
    * form — watermarked dropDuplicates keeps state bounded: ids older than
    * the watermark are expelled, so resends inside the horizon dedup and
    * state stays O(window), not O(stream). */
  def dedupStream(events: Dataset[Ev]): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "1 hour")
      // the event-time column MUST be a dedup key: that's what lets the
      // state store evict entries older than the watermark (keys without
      // the watermarked column are retained forever)
      .dropDuplicates("userId", "ts")
      .select(col("userId"), col("tsUs"))
      .as[Ev]
  }

  /** Watermarked tumbling-window event rate per user: the windowed-agg
    * path (readStream → watermark → window groupBy → writeStream). */
  def windowedRate(spark: SparkSession, events: Dataset[Ev]): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("userId"))
      .agg(count(lit(1)).as("n"))
      .select(col("userId"), unix_micros(col("window.start")).as("winStart"), col("n"))
      .as[(Long, Long, Long)]
  }

  /** Stream-static enrichment: join the event stream against a broadcast
    * dimension (user allow/deny list, doc metadata, routing table). The
    * static side is re-broadcast per micro-batch — no stream-side state
    * at all, which is what makes this the scale path for "filter a 100 TB
    * stream against a small curated table". Inner join = allowlist
    * semantics (events without a dim row are dropped). */
  def enrichStream(events: Dataset[Ev], dim: Dataset[(Long, String)]): Dataset[(Long, Long, String)] = {
    import events.sparkSession.implicits._
    events.joinWith(broadcast(dim), events("userId") === dim("_1"))
      .map { case (e, (_, tag)) => (e.userId, e.tsUs, tag) }
  }

  /** Deterministic stream sampling: pure hash-of-key filter — the SAME
    * Tables.phash the batch samplers use (one source of truth), staying
    * in codegen as a Column filter rather than a deserializing lambda.
    * Stateless, so it streams with zero state store and replays
    * identically on retry (no rand()). */
  def sampleStream(events: Dataset[Ev], pct: Int): Dataset[Ev] =
    events.filter(graft.Tables.phash(col("userId")) % 100 < pct)

  /** Watermarked STREAM-STREAM join: each purchase attributed to the same
    * user's clicks in the preceding `windowUs` microseconds. Both sides
    * carry watermarks and the join condition bounds event-time distance
    * in BOTH directions, which is what lets each side's state store evict
    * rows once the opposite watermark passes the bound — state is
    * O(events-per-window) per side, not O(stream). This is the join
    * topology batch `q_interval_join` expresses, running incrementally:
    * one output row per (purchase, click) pair inside the window. */
  def attributeStream(
      clicks: Dataset[Ev], purchases: Dataset[Ev],
      windowUs: Long = 3600000000L): Dataset[(Long, Long, Long)] = {
    import clicks.sparkSession.implicits._
    val c = clicks
      .select(col("userId").as("cUser"), timestamp_micros(col("tsUs")).as("cTs"))
      .withWatermark("cTs", "1 hour")
    val p = purchases
      .select(col("userId").as("pUser"), timestamp_micros(col("tsUs")).as("pTs"))
      .withWatermark("pTs", "1 hour")
    p.join(c,
        col("pUser") === col("cUser") &&
          col("cTs") <= col("pTs") &&
          // MICROSECOND units: dividing down to SECOND would silently
          // truncate sub-second windows (500ms -> INTERVAL 0)
          col("cTs") >= col("pTs") - expr(s"INTERVAL $windowUs MICROSECOND"))
      .select(col("pUser"), unix_micros(col("pTs")), unix_micros(col("cTs")))
      .as[(Long, Long, Long)]
  }
}

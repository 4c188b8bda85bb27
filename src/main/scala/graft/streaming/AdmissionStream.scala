package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Online admission control — the streaming twin of
  * HealthOps.q_admission_quota (ApplicationRequestController.java:82-112;
  * the reference's controller IS online: requests arrive at the master
  * and are answered from live semaphore state).
  *
  * Same decision rule as the batch operator, evaluated per arriving
  * request: within each (name-space, hour-window) group, a request is
  * admitted iff its appId already holds a permit (holderList.contains)
  * or fewer than `cap` distinct holders exist; the excluded prefix
  * bypasses without consuming permits.
  *
  * Ordering contract: decisions are made in PROCESSING order — each
  * micro-batch is sorted on (ep, eventId), but a request delivered in a
  * LATER batch than a larger key is decided against state that already
  * advanced past it. Such decisions are still deterministic for a given
  * batch split and still respect the cap invariant, but they are NOT
  * the batch query's decisions; each one is flagged `out_of_order`
  * (detected from the high-water mark kept in state), so a consumer can
  * count regressions or route them to reconciliation. Batch/stream
  * decision parity holds exactly when no decision is flagged — any
  * arrival split preserving (ep, eventId) order across batches
  * reproduces the batch query bit-for-bit (pinned in
  * AdmissionStreamSpec, which also pins the flag on a disordered feed).
  *
  * Scale shape: state per live (ns, hr) group is the holder list —
  * AT MOST `cap` longs, regardless of request volume. Groups go cold an
  * hour after their window closes; the event-time timeout reaps them
  * once the watermark passes, so total state is O(active windows × cap),
  * not O(requests). */
object AdmissionStream {

  /** One request: `ns` = name-space (prefix of the app name), `hr` = its
    * hour window, `ep`/`seq` = arrival order key (µs epoch, stable
    * tie-break). */
  case class Request(eventId: Long, userId: Long, ns: String, hr: Long,
      ep: Long)

  case class Decision(event_id: Long, ns: String, hr: Long, user_id: Long,
      admitted: Boolean, out_of_order: Boolean)

  /** Group state: permit holders plus the (ep, eventId) high-water mark
    * that detects cross-batch disorder. Holder list is AT MOST `cap`
    * longs by construction. */
  case class GroupQuota(holders: List[Long], maxEp: Long, maxEid: Long)

  /** Per-request admission decisions over a request stream. */
  def decisions(s: SparkSession, requests: Dataset[Request],
      cap: Int, exclude: String): Dataset[Decision] = {
    import s.implicits._
    requests
      .groupByKey(r => (r.ns, r.hr))
      .flatMapGroupsWithState[GroupQuota, Decision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case ((ns, hr), it, state) =>
          val ord = Ordering.Tuple2[Long, Long]
          val prior = state.getOption.getOrElse(GroupQuota(Nil, Long.MinValue, Long.MinValue))
          val holders = collection.mutable.ArrayBuffer[Long](prior.holders: _*)
          val batch = it.toIndexedSeq.sortBy(r => (r.ep, r.eventId))
          val out = batch.map { r =>
            val admitted =
              if (ns == exclude) true
              else if (holders.contains(r.userId)) true
              else if (holders.size < cap) { holders += r.userId; true }
              else false
            // decided against state that already advanced past this key:
            // deterministic, cap-respecting, but not the batch decision
            val outOfOrder =
              ord.lteq((r.ep, r.eventId), (prior.maxEp, prior.maxEid))
            Decision(r.eventId, ns, hr, r.userId, admitted, outOfOrder)
          }
          val hwm = batch.lastOption.map(r => (r.ep, r.eventId))
            .filter(ord.gt(_, (prior.maxEp, prior.maxEid)))
            .getOrElse((prior.maxEp, prior.maxEid))
          state.update(GroupQuota(
            if (ns == exclude) Nil else holders.toList, hwm._1, hwm._2))
          // reap one hour after the window closes (event-time millis)
          state.setTimeoutTimestamp((hr + 2) * 3600000L)
          out.iterator
      }
  }

  /** Convenience: decisions from a raw event stream with a watermarked
    * event-time column — mirrors the batch query's derivation (ns =
    * prefix of event_type, appId = user_id, hourly µs-epoch windows). */
  def fromEvents(s: SparkSession, events: DataFrame, cap: Int,
      exclude: String, prefixLen: Int, delay: String = "2 hours"): Dataset[Decision] = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val reqs = events
      .withColumn("ts", timestamp_micros(col("ep")))
      .withWatermark("ts", delay)
      // ts stays in the frame (as[] tolerates extra columns): dropping it
      // would strip the watermark attribute the event-time timeout needs
      .select(col("ts"), col("event_id").as("eventId"),
        col("user_id").as("userId"),
        substring(col("event_type"), 1, prefixLen).as("ns"),
        expr("ep div 3600000000").as("hr"), col("ep"))
      .as[Request]
    decisions(s, reqs, cap, exclude)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Online flow control — the streaming twin of q_flow_control
  * (FlowController.java:110-149,160-202: the reference's barrier IS
  * online — requests block at the connection until in-flight memory
  * frees; here the would-block decision is emitted per request).
  *
  * Same ledger rule as the batch operator, evaluated per arriving
  * request: a tenant's admitted requests occupy their byte size for
  * `holdUs`; a request admits iff the still-held bytes plus its own fit
  * `limit`. Requests are decided in processing order — each micro-batch
  * sorts on (ep, eventId), and cross-batch regressions behind the
  * high-water mark are flagged `out_of_order` exactly as in
  * [[AdmissionStream]] (same contract: batch/stream parity holds iff no
  * decision is flagged; FlowStreamSpec pins both directions).
  *
  * Scale shape: state per live tenant is the in-flight (ep, bytes)
  * queue — bounded by limit / min(bytes) entries, NEVER request history
  * — plus the high-water mark. The event-time timeout reaps a tenant
  * hold-horizon past its last activity once the watermark passes, so
  * total state is O(active tenants × queue bound). */
object FlowStream {

  case class FlowEv(eventId: Long, tenant: Long, ep: Long, bytes: Long)

  case class FlowDecision(event_id: Long, tenant: Long, bytes: Long,
      admitted: Boolean, out_of_order: Boolean)

  /** Tenant state: still-held (ep, bytes) plus the (ep, eventId)
    * high-water mark for disorder detection. */
  case class TenantLedger(held: List[(Long, Long)], maxEp: Long, maxEid: Long)

  def decisions(s: SparkSession, reqs: Dataset[FlowEv], limit: Long,
      holdUs: Long): Dataset[FlowDecision] = {
    import s.implicits._
    reqs
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[TenantLedger, FlowDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (tenant, it, state) =>
          val ord = Ordering.Tuple2[Long, Long]
          val prior = state.getOption.getOrElse(
            TenantLedger(Nil, Long.MinValue, Long.MinValue))
          val held = collection.mutable.Queue[(Long, Long)](prior.held: _*)
          var inBytes = held.iterator.map(_._2).sum
          val batch = it.toIndexedSeq.sortBy(r => (r.ep, r.eventId))
          val out = batch.map { r =>
            while (held.nonEmpty && held.head._1 <= r.ep - holdUs) {
              inBytes -= held.dequeue()._2
            }
            val admitted = inBytes + r.bytes <= limit
            if (admitted) { held.enqueue((r.ep, r.bytes)); inBytes += r.bytes }
            val outOfOrder =
              ord.lteq((r.ep, r.eventId), (prior.maxEp, prior.maxEid))
            FlowDecision(r.eventId, tenant, r.bytes, admitted, outOfOrder)
          }
          val hwm = batch.lastOption.map(r => (r.ep, r.eventId))
            .filter(ord.gt(_, (prior.maxEp, prior.maxEid)))
            .getOrElse((prior.maxEp, prior.maxEid))
          state.update(TenantLedger(held.toList, hwm._1, hwm._2))
          // reap a hold horizon past the tenant's last activity (ms)
          if (hwm._1 != Long.MinValue)
            state.setTimeoutTimestamp((hwm._1 + holdUs) / 1000L + 3600000L)
          out.iterator
      }
  }

  /** Decisions from a raw event stream, mirroring the batch query's
    * derivation (tenant = user_id mod FlowTenants, bytes =
    * length(props), µs epochs). */
  def fromEvents(s: SparkSession, events: DataFrame, limit: Long,
      holdUs: Long, tenants: Long, delay: String = "2 hours"): Dataset[FlowDecision] = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    events
      .withColumn("ts", timestamp_micros(col("ep")))
      .withWatermark("ts", delay)
      // ts stays in the frame: dropping it would strip the watermark
      // attribute the event-time timeout needs
      .select(col("ts"), col("event_id").as("eventId"),
        (col("user_id") % tenants).as("tenant"),
        length(col("props")).cast("long").as("bytes"), col("ep"))
      .as[FlowEv]
      .transform(decisions(s, _, limit, holdUs))
  }
}

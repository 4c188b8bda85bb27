package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online Markov transition extraction — the streaming twin of
  * `q_event_transitions` ([[graft.operators.GraphAnalyticsOps]]): events
  * arrive as a stream and each user's (prev → next) edge is emitted the
  * moment the next event lands, so a downstream counter (or the PageRank
  * refresh job) consumes transition deltas without a batch lag pass.
  *
  * State per user is ONE frontier record (t, event_id, event_type) — the
  * last event in event-time order — O(1) per user, the cheapest state in
  * the streaming family.
  *
  * Disorder contract (the FlowStream discipline): rows fold in
  * (t, event_id) order within each micro-batch, so any in-order feed —
  * however it is micro-batched — reproduces the batch lag-window pairs
  * exactly (TransitionStreamSpec pins whole-fixture parity and a split
  * feed). An event arriving BEHIND the user's frontier (cross-batch
  * disorder) cannot be spliced into already-emitted history without
  * retraction; it is emitted as a frontier→event transition flagged
  * `out_of_order = true` and the frontier stays put — consumers count it,
  * drop it, or route it to a repair pass, but are never silently lied to.
  */
object TransitionStream {

  case class Ev(user_id: Long, event_id: Long, event_type: String, t: Long)
  case class Frontier(t: Long, id: Long, typ: String)
  case class Transition(user_id: Long, prev_type: String, next_type: String,
      out_of_order: Boolean)

  /** Transition edges of an event stream carrying `user_id`, `event_id`,
    * `event_type` and nanosecond `ts` (the [[graft.Tables.events]]
    * contract). Emits one row per observed transition. */
  def transitions(s: SparkSession, stream: DataFrame): Dataset[Transition] = {
    import s.implicits._
    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"), expr("ts div 1000").as("t"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Frontier, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Frontier]) =>
          var frontier = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          rows.toSeq.sortBy(r => (r.t, r.event_id)).foreach { r =>
            val behind = frontier.exists(f =>
              r.t < f.t || (r.t == f.t && r.event_id < f.id))
            frontier match {
              case Some(f) => out += Transition(uid, f.typ, r.event_type, behind)
              case None    => // first event of the user: no edge yet
            }
            if (!behind) frontier = Some(Frontier(r.t, r.event_id, r.event_type))
          }
          frontier.foreach(state.update)
          out.iterator
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming reach (distinct-user) sketches — the online half of
  * q_rolling_distinct: arriving events fold into ONE HLL sketch per day
  * (`hll_sketch_agg` as a streaming aggregate), so the per-day state is
  * a few-kB register array instead of the day's distinct-user set, and
  * late events within the watermark still land in their own day.
  *
  * ORDER-INDEPENDENCE is what makes the sketch safe as streaming state:
  * an HLL union takes the per-register MAX, so whatever order (or
  * batching) events arrive in, the final registers — and therefore the
  * estimate — equal the batch computation's exactly (parity spec'd in
  * ReachStreamSpec, adversarial batch splits included). The trailing-
  * window merge (hll_union_agg over the last 7 daily sketches) runs on
  * the QUERY side against this state, exactly as the batch twin does.
  *
  * 100 TB shape: state is O(active days) sketches; the update is
  * partial-aggregated map-side before it ever reaches the state store —
  * raw user ids never shuffle past their first exchange. */
object ReachStream {

  /** Per-day HLL sketch + estimate of a watermarked event stream
    * (`user_id`, event-time `ts`). The grouping key is the EVENT-TIME
    * window (`window(ts, "1 day")`, epoch-aligned under the session's
    * pinned UTC), not a derived day integer: only the window column
    * carries the event-time metadata the watermark engine needs, so this
    * is what makes `delay` real — events later than it are dropped and
    * closed days' state is EVICTED instead of growing with stream
    * lifetime (a bare `groupBy(day_int)` silently accepts any lateness
    * and never evicts). The day index is derived from the window start
    * on the way out. */
  def dailyReach(s: SparkSession, stream: DataFrame,
      delay: String = "1 day"): DataFrame =
    stream
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .select(
        expr("CAST(unix_micros(w.start) div 86400000000 AS BIGINT)").as("day"),
        expr("hll_sketch_estimate(sk)").as("n_users_est"))
}

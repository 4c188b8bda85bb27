package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg

/** Streaming hot-key monitor: per-event-time-window Misra-Gries summaries
  * over a key stream — the online counterpart of q_heavy_hitters, and the
  * signal a dispatcher needs for skew response (the reference throttles
  * per-app request floods in its admission layer; a 100 TB pipeline wants
  * the same "which keys are hot RIGHT NOW" view over shuffle keys, URLs,
  * or tenant ids).
  *
  * Semantics are the sketch's, stated honestly: per window the summary
  *   - contains every key with true in-window count > n/(k+1),
  *   - undercounts each retained key by at most n/(k+1),
  * where n is the window's row count (emitted alongside). The summary
  * CONTENT beyond those guarantees depends on merge order, so the
  * batch/stream contract is the GUARANTEE, not row equality — the spec
  * asserts exactly that (unlike the engine's deterministic operators;
  * an exact online top-k would need the full per-key count state this
  * sketch exists to avoid).
  *
  * Shape: one watermarked streaming aggregation; state per window is the
  * O(k) summary + the count — not O(distinct keys). The MG aggregator
  * rides Spark's partial/final merge through `udaf()`, identical code to
  * the batch pass.
  */
object HotKeys {

  /** A keyed event with an arrival/event time (micros). */
  case class KeyedEvent(key: String, tsUs: Long)

  /** Per-window MG summary: (window_start, window_end, n_events,
    * summary: map<key, est_count>). Works on a stream (append mode once
    * the watermark closes a window) or a batch frame (same code path). */
  def hotKeys(events: Dataset[KeyedEvent], window: String = "1 hour",
      k: Int = 256, horizon: String = "1 hour"): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k), Encoders.STRING)
    events.toDF()
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", horizon)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(mg(col("key")).as("sketch")) // buffer carries n — no second agg
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("sketch.n").as("n_events"), col("sketch.m").as("summary"))
  }
}

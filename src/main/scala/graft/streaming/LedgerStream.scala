package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online shuffle-ledger ingestion — the streaming twin of the batch
  * ledger family ([[graft.operators.LedgerOps]]): block-index records
  * arrive as a stream and the latest-attempt-wins materialization is kept
  * current per map task, so a consumer reads committed totals without
  * waiting for a batch pass.
  *
  * One keyed state machine per map task carries BOTH reference guards:
  *   - resend dedup: the state holds the seq_id set of the CURRENT
  *     attempt — exactly the reference reader's per-partition LongHashSet
  *     (ShufflePartitionReader.java:378-393), so a resent block is
  *     recognized and dropped however often it arrives;
  *   - latest-attempt-wins: a row of an older attempt is DISCARDED (late
  *     data from a superseded task attempt, Ors2Util.scala:75-81); a row
  *     of a NEWER attempt resets the totals AND the seq set (a superseded
  *     attempt's dedup memory is garbage by definition — the state never
  *     holds more than one attempt's seqs).
  *
  * Arrival-order independence (the property LedgerStreamSpec pins): any
  * row of the eventual max attempt either finds state already at that
  * attempt (dedup + accumulate) or raises it (reset, then accumulate) —
  * so the final state equals the batch computation under ANY permutation
  * of arrivals, including interleaved duplicates. Within a micro-batch,
  * rows fold in (attempt_id, seq_id) order so per-batch emissions are
  * deterministic too.
  *
  * Scale shape: state is O(blocks of ONE attempt) per map task — the
  * reference pays the identical LongHashSet footprint per reader — and
  * totals are three longs. Update-mode emissions carry a per-key
  * monotonically increasing `upd` so appending sinks (memory, kafka)
  * take the max-upd row per key as the current value.
  */
object LedgerStream {

  case class LedgerRow(ts: java.sql.Timestamp, map_id: Int,
      attempt_id: Long, seq_id: Int, length: Long)
  case class LedgerState(maxAtt: Long, seqs: Array[Int], lenSum: Long, upd: Long)
  case class LedgerUpdate(map_id: Int, max_att: Long, cnt: Long,
      len_sum: Long, upd: Long)

  /** Latest-attempt-wins totals of a block-record stream (`ts`,
    * `map_id`, `attempt_id`, `seq_id`, `length`). Emits one update row
    * per (map, micro-batch with changes). */
  def latestWins(s: SparkSession, stream: DataFrame): Dataset[LedgerUpdate] = {
    import s.implicits._
    stream
      .select(col("ts"), col("map_id").cast("int").as("map_id"),
        col("attempt_id").cast("long").as("attempt_id"),
        col("seq_id").cast("int").as("seq_id"),
        col("length").cast("long").as("length"))
      .as[LedgerRow]
      .groupByKey(_.map_id)
      .flatMapGroupsWithState[LedgerState, LedgerUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (mapId: Int, rows: Iterator[LedgerRow], state: GroupState[LedgerState]) =>
          val st0 = state.getOption.getOrElse(
            LedgerState(-1L, Array.empty[Int], 0L, 0L))
          var maxAtt = st0.maxAtt
          var lenSum = st0.lenSum
          val seqs = scala.collection.mutable.Set.empty[Int] ++ st0.seqs
          // deterministic fold order within the micro-batch
          rows.toSeq.sortBy(r => (r.attempt_id, r.seq_id)).foreach { r =>
            if (r.attempt_id > maxAtt) {
              maxAtt = r.attempt_id
              seqs.clear()
              seqs += r.seq_id
              lenSum = r.length
            } else if (r.attempt_id == maxAtt && seqs.add(r.seq_id)) {
              lenSum += r.length
            }
            // else: stale attempt or resent block — drop
          }
          if (maxAtt == st0.maxAtt && seqs.size == st0.seqs.length)
            Iterator.empty
          else {
            val st = LedgerState(maxAtt, seqs.toArray.sorted, lenSum, st0.upd + 1L)
            state.update(st)
            Iterator.single(LedgerUpdate(
              mapId, maxAtt, st.seqs.length.toLong, lenSum, st.upd))
          }
      }
  }
}

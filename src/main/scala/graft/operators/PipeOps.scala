package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Native-format pipe queries — the read-side data-plane operators
  * (SURVEY.md §2A #21-26) running over the reference's OWN binary file
  * format through [[graft.sources.PipeDataSource]], instead of over the
  * parquet model [[LedgerOps]] uses. Together they close the loop: a user
  * of the reference can point this engine at a pipe directory tree and run
  * the latest-attempt / dedup / checksum audits the reference hard-codes
  * in its reader (PartitionPipeReader.java:150-170,
  * ShufflePartitionReader.java:217-249,378-393) as plain DataFrame
  * programs.
  *
  * Fixture: [[pipeRows]] derives a deterministic block stream from
  * `lineitem` and [[pipeDir]] publishes it ONCE per session as real
  * finalized `.dat_final` files (the artifact-backed-query economics:
  * publish once, probe many). The stream plants all three fault shapes
  * the read path exists to clean, each SQL-replayable for the oracle:
  *
  *   - task-retry duplicates: maps with `map_id % 4 == 0` write their
  *     whole block set twice, attempts 0 and 1 (Ors2Util.scala:75-81);
  *   - resend duplicates: blocks of `l_linenumber == 1` rows are written
  *     twice under the same (attempt, seq) (ShufflePartitionReader.java:
  *     378-393);
  *   - a corrupted ledger: (partition 2, map 5) stores checksum + 1, so
  *     verification must flag exactly that group.
  *
  * Scale notes (100 TB): all three queries aggregate 32-byte lineage
  * records, never payload bytes — `q_pipe_scan`/`q_pipe_latest` prune the
  * `payload` column, which the source turns into seek-past-block IO, and
  * `q_pipe_scan`'s partition predicate prunes directories at planning
  * time. The checksum verify reads payloads once, shuffles only
  * per-(partition, map) CRC aggregates — map-side combined, 16 bytes per
  * group on the wire.
  */
object PipeOps {
  private type Q = (SparkSession, String) => DataFrame

  private[graft] val Source = "graft.sources.PipeDataSource"

  /** The deterministic block stream (one row per written block).
    * Payload bytes are the UTF-8 of `ok|pk|sk|ln` — integer-only so
    * `octet_length` on the DuckDB side prices the bytes identically. */
  private[graft] def pipeRows(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d).select(
      pmod(col("l_orderkey"), lit(8)).cast("int").as("partition_id"),
      pmod(col("l_suppkey"), lit(16)).cast("int").as("map_id"),
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      concat_ws("|", col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber")).as("ptxt"))
    val w = Window.partitionBy("partition_id", "map_id").orderBy("ok", "ln")
    base
      .withColumn("seq_id", row_number().over(w).cast("int"))
      // retry expansion BEFORE resend expansion: a retried map re-sends
      // its full block set under attempt 1 with the SAME seq ids
      .withColumn("attempt_id", explode(
        when(col("map_id") % 4 === 0, array(lit(0L), lit(1L)))
          .otherwise(array(lit(0L)))))
      .withColumn("resend", explode(
        when(col("ln") === 1, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))))
      .select(
        col("partition_id"), col("map_id"), col("attempt_id"), col("seq_id"),
        encode(col("ptxt"), "UTF-8").as("payload"))
  }

  /** Session-shared pipe-tree publish under `target/pipe/<dir>`, the
    * (2, 5) ledger corrupted post-write ([[graft.sources.PipeFiles
    * .corruptLedger]] — an on-disk fault, exactly what the verify query
    * exists to catch). */
  private[graft] def pipeDir(s: SparkSession, d: String): String =
    graft.SharedPlans.once(s, s"pipe_files|$d") {
      val p = s"${graft.sources.StorageOps.artifactBase}/pipe/${d.replaceAll("[^A-Za-z0-9._-]", "_")}"
      graft.sources.PipeFiles.write(pipeRows(s, d), p)
      val n = graft.sources.PipeFiles.corruptLedger(
        s.sessionState.newHadoopConf(), p, 2, 5, 1L)
      require(n > 0, s"fixture fault not planted: no (2,5) ledger in $p")
      p
    }

  private def pipe(s: SparkSession, d: String): DataFrame =
    s.read.format(Source).load(pipeDir(s, d))

  /** Data rows only (checksum records carry the ledger, not blocks). */
  private def dataRows(df: DataFrame): DataFrame =
    df.filter(col("seq_id") =!= graft.sources.PipeFiles.ChecksumSeqId)

  /** Raw-stream audit of a partition slice: every physically written
    * block under `partition_id < 4` (directory pruning) counted per
    * partition WITHOUT reading one payload byte (column pruning →
    * seek-past-block IO). */
  private val qPipeScan: Q = (s, d) =>
    dataRows(pipe(s, d))
      .filter(col("partition_id") < 4)
      .groupBy("partition_id")
      .agg(count(lit(1)).as("n_blocks"), sum(col("length")).as("n_bytes"),
        countDistinct(col("map_id")).as("n_maps"))
      .orderBy("partition_id")

  /** The reference reader's cleaning pipeline as one DataFrame: keep each
    * map's LATEST attempt (Ors2Util.scala:75-81), drop resend duplicates
    * on (map, attempt, seq) (ShufflePartitionReader.java:378-393) — the
    * surviving stream must be exactly the logical block set. Lineage-only
    * columns: the payload is never read here either. */
  private val qPipeLatest: Q = (s, d) => {
    val data = dataRows(pipe(s, d))
      .select("partition_id", "map_id", "attempt_id", "seq_id", "length")
    val latest = data.groupBy("partition_id", "map_id")
      .agg(max(col("attempt_id")).as("attempt_id"))
    data.join(latest, Seq("partition_id", "map_id", "attempt_id"))
      .dropDuplicates("partition_id", "map_id", "attempt_id", "seq_id")
      .groupBy("partition_id")
      .agg(count(lit(1)).as("n_blocks"), sum(col("length")).as("n_bytes"))
      .orderBy("partition_id")
  }

  /** Checksum verification (ShufflePartitionReader.java:217-249): per
    * (partition, map), the recomputed `sum(crc32(payload))` over the
    * cleaned stream against the stored ledger records — the planted
    * corruption at (2, 5) must be the ONLY mismatch. The oracle cannot
    * run CRC32 (DuckDB has none), so it checks the OUTCOME against the
    * planted-fault ground truth plus the exactly-recomputed block counts
    * — the ok column is engine-computed from real CRC32s, oracle-pinned
    * by where the fault was planted.
    *
    * Known edge (documented, matching the format's own assumption): a
    * map whose SAME-attempt blocks repeat the same seq across two FILES
    * (cross-file resend) double-counts in the summed stored ledgers —
    * the reference never produces that layout (one worker file owns a
    * (partition, map, attempt)'s stream), and neither does
    * [[graft.sources.PipeFiles.write]] (clustered by partition). */
  private val qPipeChecksumVerify: Q = (s, d) => {
    val rows = pipe(s, d)
    val data = dataRows(rows)
      .select("partition_id", "map_id", "attempt_id", "seq_id", "payload")
    val latest = data.groupBy("partition_id", "map_id")
      .agg(max(col("attempt_id")).as("attempt_id"))
    val computed = data
      .join(latest, Seq("partition_id", "map_id", "attempt_id"))
      .dropDuplicates("partition_id", "map_id", "attempt_id", "seq_id")
      .groupBy("partition_id", "map_id")
      .agg(sum(crc32(col("payload"))).as("computed"),
        count(lit(1)).as("n_blocks"))
    // ledger records pass the SAME attempt gate the reference's reader
    // applies before trusting a checksum (PartitionPipeReader.java:
    // 150-170 discards non-latest checksum records): in a multi-wave
    // tree, a superseded attempt's file still carries its own ledger —
    // summing it in would flag every retried map as corrupt
    val stored = rows
      .filter(col("seq_id") === graft.sources.PipeFiles.ChecksumSeqId)
      .join(latest, Seq("partition_id", "map_id", "attempt_id"))
      .groupBy("partition_id", "map_id")
      .agg(sum(col("checksum")).as("stored"))
    computed.join(stored, Seq("partition_id", "map_id"))
      .select(col("partition_id"), col("map_id"), col("n_blocks"),
        (col("computed") === col("stored")).as("ok"))
      .orderBy("partition_id", "map_id")
  }

  /** Payload-content round-trip inside the gate: decode the cleaned
    * stream's block bytes back to their typed fields and aggregate —
    * the checksum query proves the bytes' CRC ledger, this one proves
    * the BYTES themselves carry the data (write → finalize → scan →
    * decode, byte-exact against the oracle's recomputation from the
    * source table). The payload column is read here, so this is also
    * the gate's exercise of the non-pruned read path. */
  private val qPipeDecode: Q = (s, d) => {
    val data = dataRows(pipe(s, d))
      .select("partition_id", "map_id", "attempt_id", "seq_id", "payload")
    val latest = data.groupBy("partition_id", "map_id")
      .agg(max(col("attempt_id")).as("attempt_id"))
    data.join(latest, Seq("partition_id", "map_id", "attempt_id"))
      .dropDuplicates("partition_id", "map_id", "attempt_id", "seq_id")
      .select(col("partition_id"),
        split(decode(col("payload"), "UTF-8"), "\\|").as("f"))
      .select(col("partition_id"),
        element_at(col("f"), 1).cast("long").as("ok"),
        element_at(col("f"), 2).cast("long").as("pk"),
        element_at(col("f"), 3).cast("long").as("sk"),
        element_at(col("f"), 4).cast("long").as("ln"))
      .groupBy("partition_id")
      .agg(count(lit(1)).as("n_rows"), sum(col("ok")).as("sum_ok"),
        sum(col("pk")).as("sum_pk"), sum(col("sk")).as("sum_sk"),
        sum(col("ln")).as("sum_ln"))
      .orderBy("partition_id")
  }

  val queries: Map[String, Q] = Map(
    "q_pipe_scan" -> qPipeScan,
    "q_pipe_latest" -> qPipeLatest,
    "q_pipe_checksum_verify" -> qPipeChecksumVerify,
    "q_pipe_decode" -> qPipeDecode,
  )

  /** Shared derivation CTE: the logical rows plus the physical write
    * multiplicity (retry × resend). */
  private val BaseCte =
    """WITH base AS (
      |  SELECT CAST(l_orderkey % 8 AS INT) AS pid,
      |         CAST(l_suppkey % 16 AS INT) AS mid,
      |         l_linenumber AS ln,
      |         strlen(CAST(l_orderkey AS VARCHAR) || '|' ||
      |                      CAST(l_partkey AS VARCHAR) || '|' ||
      |                      CAST(l_suppkey AS VARCHAR) || '|' ||
      |                      CAST(l_linenumber AS VARCHAR)) AS len
      |  FROM lineitem),
      |mult AS (
      |  SELECT pid, mid, len,
      |         (CASE WHEN mid % 4 = 0 THEN 2 ELSE 1 END) *
      |         (CASE WHEN ln = 1 THEN 2 ELSE 1 END) AS m
      |  FROM base)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pipe_scan" -> s"""$BaseCte
      |SELECT pid AS partition_id,
      |       CAST(sum(m) AS BIGINT) AS n_blocks,
      |       CAST(sum(CAST(len AS BIGINT) * m) AS BIGINT) AS n_bytes,
      |       count(DISTINCT mid) AS n_maps
      |FROM mult WHERE pid < 4 GROUP BY 1 ORDER BY 1""".stripMargin,
    // the cleaned stream == the logical rows, exactly once each
    "q_pipe_latest" -> s"""$BaseCte
      |SELECT pid AS partition_id,
      |       count(*) AS n_blocks,
      |       CAST(sum(CAST(len AS BIGINT)) AS BIGINT) AS n_bytes
      |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pipe_checksum_verify" -> s"""$BaseCte
      |SELECT pid AS partition_id, mid AS map_id,
      |       count(*) AS n_blocks,
      |       NOT (pid = 2 AND mid = 5) AS ok
      |FROM base GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the cleaned stream's decoded fields == the source rows, byte-exact
    "q_pipe_decode" ->
      """SELECT CAST(l_orderkey % 8 AS INT) AS partition_id,
        |       count(*) AS n_rows,
        |       CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
        |       CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
        |       CAST(sum(l_suppkey) AS BIGINT) AS sum_sk,
        |       CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}

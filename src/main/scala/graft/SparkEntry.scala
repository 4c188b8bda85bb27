package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is a pure `(SparkSession, sfDir) => DataFrame`
  * with a deterministic result; [[oracleSql]] carries the equivalent DuckDB
  * SQL the driver cross-checks at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's golden e2e test semantics
    * (Ors2ShuffleManagerTest.scala:74-81). */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.qRepartitionCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreOps.queries ++ LedgerOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ VectorOps.queries ++ MultiModalOps.queries ++
      PipelineOps.queries ++ HealthOps.queries ++ CurationOps.queries ++
      SkewOps.queries ++ AudioOps.queries ++ EventOps.queries ++
      LinkOps.queries ++ GraphAnalyticsOps.queries ++ VideoOps.queries ++
      RetrievalOps.queries ++ PipeOps.queries

  /** Pure-OBSERVABILITY queries: oracle-checked health/recall floors (the
    * correctness gate pins their VALUES every round) whose timings no
    * regression adjudication reads — [[Bench]] caps them at MIN-OF-2
    * interleaved reps (r13's single rep proved un-adjudicable: one
    * contention spike landed in the headline un-voted; a third rep would
    * waste the slow-tail budget on numbers no decision reads). */
  val ObservabilityQueries: Set[String] =
    Set("q_ann_recall", "q_ann_recall_sampled", "q_ann_recall_idx",
      "q_ann_recall_res_idx",
      "q_index_stats", "q_dedup_index_stats",
      "q_dedup_index_escalated_stats", "q_fingerprint_index_stats",
      "q_fingerprint_index_escalated_stats", "q_embed_diagnostics",
      "q_lex_index_stats")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOps.oracles ++ LedgerOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ VectorOps.oracles ++ MultiModalOps.oracles ++
      PipelineOps.oracles ++ HealthOps.oracles ++ CurationOps.oracles ++
      SkewOps.oracles ++ AudioOps.oracles ++ EventOps.oracles ++
      LinkOps.oracles ++ GraphAnalyticsOps.oracles ++ VideoOps.oracles ++
      RetrievalOps.oracles ++ PipeOps.oracles
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.Tables

/** The batch curation rules (PipelineOps) as STREAMING transforms: a
  * document stream is quality-filtered and hash-sampled with the exact
  * same deterministic rules the batch funnel applies — so a corpus can be
  * curated incrementally as documents arrive, and replays produce
  * identical decisions (everything is a pure function of the row; no
  * state store, no rand()).
  *
  * Only the STATELESS stages stream here (tokenize/quality/sample).
  * Exact and near-dup dedup need cross-document state; their streaming
  * forms are watermarked dropDuplicates (see Sessionize.dedupStream) and
  * periodic batch re-clustering respectively — the standard lambda split
  * for dedup at scale.
  */
object CurationStream {

  case class Doc(docId: Long, lang: String, text: String)
  case class Curated(docId: Long, lang: String, nTokens: Long,
      qualityOk: Boolean, sampled: Boolean)

  /** Apply tokenize → quality rules → per-lang hash sampling to a
    * (streaming or batch) document Dataset. Rules are IDENTICAL to
    * q_quality_filter / q_stratified_sample — spec-pinned. */
  def curate(docs: Dataset[Doc]): DataFrame =
    docs
      .select(col("docId"), col("lang"),
        graft.operators.TextRules.tokens(col("text")).as("toks"))
      .withColumn("nTokens", size(col("toks")).cast("long"))
      .withColumn("qualityOk",
        graft.operators.TextRules.qualityOk(col("toks"), col("nTokens")))
      .withColumn("sampled",
        col("qualityOk") && Tables.phash(col("docId")) % 100 <
          graft.operators.TextRules.sampleRate(col("lang")))
      .select("docId", "lang", "nTokens", "qualityOk", "sampled")
}

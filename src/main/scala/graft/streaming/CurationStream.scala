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
  * The stateless stages (tokenize/quality/sample) stream as pure column
  * transforms. EXACT dedup streams too, as [[dedupByFingerprint]]: the
  * same md5 fingerprint key the batch funnel groups on, deduplicated with
  * bounded state via the watermark. NEAR-dup streams as
  * [[NearDupStream.nearDupAgainstCorpus]] — a stream-static join of each
  * arriving doc's MinHash band keys against the corpus band index,
  * refreshed on each batch rebuild (freshness contract documented there).
  */
object CurationStream {

  case class Doc(docId: Long, lang: String, text: String)
  case class Curated(docId: Long, lang: String, nTokens: Long,
      qualityOk: Boolean, sampled: Boolean)
  /** A document with an arrival/event time — the dedup stream's input. */
  case class TimedDoc(docId: Long, lang: String, text: String, tsUs: Long)

  /** Streaming exact dedup on the canonical content fingerprint
    * ([[Tables.fingerprint]] — the SAME key the batch funnel's exact
    * stage groups on): the first document per fingerprint passes,
    * re-arrivals within the watermark horizon are dropped.
    * `dropDuplicatesWithinWatermark` keys the state store on the
    * fingerprint alone while still expiring entries as the watermark
    * advances, so state is O(docs-per-horizon), not O(stream). Decisions
    * match the batch funnel's `exact_ok` flags whenever arrival order
    * follows doc_id order (the batch keeper is min doc_id; the stream's
    * is first-arrived) — spec-pinned in StreamingSpec. */
  def dedupByFingerprint(docs: Dataset[TimedDoc], horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", Tables.fingerprint(col("text")))
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
      .select("docId", "lang", "text", "tsUs")

  /** Streaming chunker: the q_chunk geometry (ChunkSize/ChunkStride
    * windows over the shared tokenizer) as a stateless per-row transform
    * — an arriving doc explodes into its chunk rows immediately, so the
    * indexing/embedding stages downstream consume chunks at arrival
    * latency. Pure projection + explode: no state store, no watermark
    * needed, decisions identical to the batch operator by construction
    * (spec-pinned batch-vs-stream in StreamingSpec). */
  def chunkStream(docs: Dataset[Doc]): DataFrame =
    graft.operators.TextOps.chunkRows(docs.toDF()
      .select(col("docId").as("doc_id"),
        graft.operators.TextRules.tokens(col("text")).as("toks")))

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

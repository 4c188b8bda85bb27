package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE single definition of the corpus curation rules — tokenization,
  * quality thresholds, and sampling rates — shared by the batch operators
  * (q_quality_filter, q_stratified_sample), the e2e funnel
  * (q_pipeline_e2e) and the streaming path (CurationStream). Any edit
  * here changes all three together; their DuckDB oracles and the
  * batch-vs-stream parity spec keep them honest.
  */
object TextRules {
  val MinTokens = 10L
  val MaxTokens = 1000L
  val MinMeanLen = 2.0
  val MaxMeanLen = 12.0
  val MaxStopRatio = 0.2
  val Stopword = "the"
  val EnSampleRate = 5
  val DefaultSampleRate = 20

  /** Lowercased \W+-split tokens, empties removed (the shared tokenizer;
    * DuckDB mirror: list_filter(string_split_regex(lower(text), '\W+'),
    * x -> x <> '')). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), x => x =!= lit(""))

  def meanTokenLen(toks: Column, n: Column): Column =
    aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / n

  def stopwordRatio(toks: Column, n: Column): Column =
    size(filter(toks, t => t === lit(Stopword))).cast("double") / n

  /** The composite quality gate (reasons == 0 in q_quality_filter's
    * bitmask form). Safe for n = 0: the token-count clause is false and
    * three-valued AND keeps the whole expression false. */
  def qualityOk(toks: Column, n: Column): Column =
    n >= MinTokens && n <= MaxTokens &&
      meanTokenLen(toks, n) >= MinMeanLen &&
      meanTokenLen(toks, n) <= MaxMeanLen &&
      stopwordRatio(toks, n) <= MaxStopRatio

  /** Per-language sampling rate in percent. */
  def sampleRate(lang: Column): Column =
    when(lang === "en", EnSampleRate).otherwise(DefaultSampleRate)
}

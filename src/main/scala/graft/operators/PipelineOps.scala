package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Training-data pipeline shaping operators (builder prompt: the ops a
  * 100 TB LLM-data pipeline needs beyond the reference's own surface):
  * boilerplate detection, deterministic sampling (stratified + per-group),
  * token histograms, normalization, quality filtering, and interval joins.
  *
  * Design rules shared by the family:
  *  - sampling is HASH-deterministic (portable multiplicative hash), never
  *    rand(): reproducible across runs/engines, and exactly replayable in
  *    the DuckDB oracle — the property the reference gets from seeded
  *    scrambling (RandomSortPartition.java:34-63);
  *  - every aggregate is partial-aggregable (groupBy/agg, no global
  *    windows); per-group windows only partition by bounded keys (lang);
  *  - text ops run on the tokenized form once — token arrays flow through
  *    codegen'd array expressions, strings are never re-split per rule.
  */
object PipelineOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Tokenized documents: (doc_id, lang, toks) — TextRules tokenizer. */
  private def toked(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), TextRules.tokens(col("text")).as("toks"))

  /** Boilerplate share per document: the fraction of a doc's distinct
    * shingles that are corpus-common (present in >= 5% of shingled docs).
    * The Gopher-style "repeated passage" signal: high ratio = the doc is
    * mostly template. Fraction threshold scales with corpus size, an
    * absolute count would not. */
  private val qTextBoilerplate: Q = (s, d) => {
    // carry 8-byte shingle hashes, not strings: the common-set join keys
    // and shuffles on fixed-width longs, and there is NO broadcast hint —
    // at 100 TB "5% of docs" shingles can exceed broadcast limits, so the
    // join is left to AQE (it will still broadcast when the runtime size
    // allows). xxhash64 collisions across ~10^5 distinct shingles are
    // ~1e-9 — negligible against the 0.05 df threshold.
    val sh = graft.Caching.persist(DedupOps.shingles(s, d)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h")))
    // corpus doc count via parquet metadata (footer row counts — no text
    // scan, no extra action over the shingle pipeline); the df threshold
    // is then "5% of corpus docs", same base the ngram cap uses
    val nDocs = Tables.documents(s, d).count()
    val common = sh.groupBy("h")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= lit(nDocs) * 0.05)
      .select("h")
    sh.join(common.withColumn("is_common", lit(1L)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("is_common"), lit(0L))).as("n_common"))
      .withColumn("boiler_ratio",
        col("n_common").cast("double") / col("n_shingles"))
      .withColumn("keep", col("boiler_ratio") <= 0.3)
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling: per-language rates (en 5%, others
    * 20%), keep iff phash(doc_id) % 100 < rate. The decision depends only
    * on (doc_id, lang) — reproducible on any cluster size, no rand(). */
  private val qStratifiedSample: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("kept",
        (Tables.phash(col("doc_id")) % 100 < TextRules.sampleRate(col("lang")))
          .cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
        sum(col("doc_id") * col("kept")).as("kept_id_sum"))
      .orderBy("lang")
  }

  /** Deterministic k-per-group reservoir: the 3 docs with the smallest
    * doc_id-hash per language. The window partitions by a bounded key
    * (5 languages), so no single-partition funnel; at scale this is the
    * per-stratum "fixed-size sample" primitive. */
  private val qGroupSample: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), Tables.phash(col("doc_id")).as("hk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))))
      .filter(col("rk") <= 3)
      .select("lang", "doc_id", "rk")
      .orderBy("lang", "rk")

  /** Token-count histogram (bucket width 20): the length-distribution
    * snapshot every corpus curation run starts with. */
  private val qTokenHist: Q = (s, d) =>
    toked(s, d)
      .select(size(col("toks")).cast("long").as("n"))
      .withColumn("bucket", expr("n div 20"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("n").as("min_toks"),
        max("n").as("max_toks"))
      .orderBy("bucket")

  /** Canonical text normalization: lowercase, strip non-alphanumerics,
    * collapse runs of spaces, trim. Emits md5 of the normalized text so
    * the oracle verifies the exact byte-level transform, not a summary. */
  private val qTextNormalize: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm"))
      .select(col("doc_id"), length(col("norm")).as("norm_len"),
        md5(col("norm")).as("norm_md5"))
      .orderBy("doc_id")

  /** Gopher-style composite quality filter. Reasons are a bitmask so one
    * pass yields both the keep decision and the audit trail:
    * 1 = token count outside [10, 1000], 2 = mean token length outside
    * [2, 12], 4 = stopword ("the") ratio > 0.2. */
  private val qQualityFilter: Q = (s, d) =>
    toked(s, d)
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("sum_len",
        expr("aggregate(toks, 0L, (a, t) -> a + length(t))"))
      .withColumn("n_the",
        expr("size(filter(toks, t -> t = 'the'))").cast("long"))
      // n=0 guard: 0/0 is null here but NaN in DuckDB (and NaN > 0.2 is
      // true there) — gate the ratio rules on n > 0 in BOTH engines so a
      // zero-token doc carries only the token-count reason bit
      .withColumn("mean_len",
        when(col("n") > 0, col("sum_len").cast("double") / col("n")))
      .withColumn("the_ratio",
        when(col("n") > 0, col("n_the").cast("double") / col("n")))
      .withColumn("reasons",
        when(col("n") < TextRules.MinTokens ||
          col("n") > TextRules.MaxTokens, 1).otherwise(0) +
          when(col("n") > 0 && (col("mean_len") < TextRules.MinMeanLen ||
            col("mean_len") > TextRules.MaxMeanLen), 2).otherwise(0) +
          when(col("n") > 0 &&
            col("the_ratio") > TextRules.MaxStopRatio, 4).otherwise(0))
      .groupBy(col("lang"), col("reasons"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("lang", "reasons")

  /** Corpus-self-trained unigram LM score per document — the CCNet-style
    * perplexity signal: avg over a doc's tokens of ln P(tok), with P
    * estimated from the corpus's own token frequencies. Low (very
    * negative) scores = rare-token gibberish; high = stopword soup.
    *
    * Shape: one explode (map-side) → one token-frequency aggregation →
    * one join of the exploded tokens against the frequency table (AQE
    * broadcasts it while it fits; shuffle join on the token key beyond) →
    * one per-doc aggregation. The corpus-total token count rides as a
    * broadcast 1-row aggregate. avg(ln(...)) is order-sensitive at 1e-15,
    * so the score is rounded to 4 decimals on BOTH engines (the
    * engine-parity convention q_embed_centroids established). */
  private val qLmScore: Q = (s, d) => {
    // persisted: feeds the frequency table, the total, and the join side
    val toks = graft.Caching.persist(toked(s, d)
      .select(col("doc_id"), explode(col("toks")).as("tok")))
    val tf = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(tf, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(avg(log(col("tf").cast("double") / col("total"))), 4)
          .as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Interval self-join on the event stream: for each error event, the
    * count of purchase events by the same user within ±10 minutes.
    *
    * The join key is (user_id, time-bucket), not user_id alone: with
    * only the equi key, one hot user with millions of events makes the
    * per-key fan-out quadratic (every error × every purchase of that
    * user, with the ±10 min range as a post-filter). Composing
    * q_range_join's bucket decomposition on TOP of the equi key bounds
    * pair work by local density — bucket width = interval length (2W),
    * so each error interval explodes to at most 2 bucket rows, and a
    * purchase meets an interval at most once (its single p_bucket;
    * sequence() never repeats a value), so no dedup is needed.
    *
    * Sign-correctness of the truncating `div` bucketing: coverage only
    * needs the bucket map to be MONOTONE — pep in [ep-W, ep+W] then
    * implies pep div B lies in [(ep-W) div B, (ep+W) div B], and the
    * exploded sequence spans every integer in that range. Truncating
    * division is monotone over the whole int64 line (it merely widens
    * the bucket straddling zero to 2B-1), so the decomposition stays
    * exactly equivalent to the direct range join for NEGATIVE epochs
    * too — no floor-div needed, no non-negativity precondition
    * (PipelineSpec pins a pre-1970 fixture against the direct join).
    *
    * The left join keeps zero-purchase errors: both unmatched bucket
    * rows contribute 0 to the sum. Epochs in exact microseconds (ts is
    * int64 nanos; div 1000 matches DuckDB's ns→µs truncation). */
  private val qIntervalJoin: Q = (s, d) => {
    val W = 600000000L // ±10 min in µs
    val B = 2 * W      // bucket width == interval length → ≤ 2 buckets each
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ep"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ep"))
      .withColumn("bucket",
        explode(sequence(expr(s"(ep - $W) div $B"), expr(s"(ep + $W) div $B"))))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ep").as("pep"))
      .withColumn("p_bucket", expr(s"pep div $B"))
    err.join(pur,
        col("user_id") === col("p_uid") && col("bucket") === col("p_bucket") &&
          abs(col("pep") - col("ep")) <= W,
        "left")
      .groupBy(col("event_id"))
      .agg(sum(when(col("pep").isNotNull, 1L).otherwise(0L)).as("n_nearby"))
      .orderBy("event_id")
  }

  /** PURE range join (no equi key): shipments falling inside sampled
    * 7-day audit windows. Without an equi key Spark plans a nested-loop
    * join — O(|points|·|intervals|), a non-starter at scale. The classic
    * fix, composed from existing operators: quantize the time axis into
    * width-W buckets, explode each interval to the buckets it overlaps
    * (≤ 2 for W = interval length), tag each point with its bucket, and
    * equi-join on the bucket with the precise range predicate as a
    * residual filter. Pair work drops from |P|·|I| to
    * Σ_b |P_b|·|I_b| — bounded by local density, not corpus size.
    * Windows are phash-sampled (deterministic, oracle-replayable). */
  // bucket width in days == interval length (one constant, used by the
  // Spark side AND the oracle SQL — they must never drift apart)
  private val RangeJoinW = 7L

  /** Epoch-micros → epoch-day as FLOOR division (pmod keeps the remainder
    * non-negative, so the subtraction floors for any sign). Spark's `div`
    * truncates toward zero while the oracle's `//` floors — they agree
    * only for positive epochs; this form agrees for pre-1970 dates too. */
  private def epochDay(tsCol: String): Column = {
    val us = s"unix_micros(CAST($tsCol AS TIMESTAMP))"
    expr(s"CAST(($us - pmod($us, 86400000000)) div 86400000000 AS BIGINT)")
  }

  private val qRangeJoin: Q = (s, d) => {
    val W = RangeJoinW
    // the day→bucket step uses plain `div`: the bucket function only needs
    // to be monotone and identical for points and intervals, and
    // truncation is monotone — no oracle mirror exists for buckets
    val iv = Tables.orders(s, d)
      .filter(Tables.phash(col("o_orderkey")) % 100 < 2)
      .select(col("o_orderkey"), epochDay("o_orderdate").as("start_day"))
      .withColumn("end_day", col("start_day") + W)
      .withColumn("bucket",
        explode(sequence(expr(s"start_day div $W"), expr(s"end_day div $W"))))
    val pts = Tables.lineitem(s, d)
      .select(col("l_quantity"), epochDay("l_shipdate").as("ship_day"))
      .withColumn("bucket", expr(s"ship_day div $W"))
    pts.join(iv, Seq("bucket"))
      .filter(col("ship_day") >= col("start_day") &&
        col("ship_day") <= col("end_day"))
      // a point can meet the same interval via only one bucket (its own),
      // so no dedup is needed before aggregating
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"),
        // floor on both sides: Spark cast truncates, DuckDB CAST rounds
        sum(floor(col("l_quantity")).cast("long")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** End-to-end curation pipeline in ONE DAG — the flagship integration:
    *   normalize/tokenize → quality filter (reasons == 0) →
    *   exact dedup (md5 fingerprint, keep min doc_id) →
    *   near-dup drop (exact-verified MinHash pairs, drop the larger id) →
    *   deterministic stratified sample (per-lang hash rates).
    * Output: per-language survivor counts after each stage plus a
    * kept-id checksum — the funnel report every corpus build emits.
    * Every stage is the already-oracled operator re-used as a flag
    * column, so one pass computes the whole funnel (no per-stage
    * materialization; at 100 TB each flag is a codegen'd column and the
    * only exchanges are the fingerprint groupBy and the pair join). */
  private val qPipelineE2e: Q = (s, d) => {
    val q = toked(s, d)
      .withColumn("quality_ok",
        TextRules.qualityOk(col("toks"), size(col("toks")).cast("long")))
      .select("doc_id", "lang", "quality_ok")
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), Tables.fingerprint(col("text")).as("fp"))
    val keeper = fp.groupBy("fp").agg(min("doc_id").as("keep_id"))
    val exact = fp.join(keeper, "fp")
      .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("exact_ok"))
    val dropB = DedupOps.nearDupPairs(s, d)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    q.join(exact, "doc_id")
      .join(dropB, Seq("doc_id"), "left")
      .withColumn("nd_ok", col("is_dup").isNull)
      .withColumn("samp_ok",
        Tables.phash(col("doc_id")) % 100 < TextRules.sampleRate(col("lang")))
      .withColumn("s1", col("quality_ok").cast("long"))
      .withColumn("s2", (col("quality_ok") && col("exact_ok")).cast("long"))
      .withColumn("s3",
        (col("quality_ok") && col("exact_ok") && col("nd_ok")).cast("long"))
      .withColumn("s4", (col("quality_ok") && col("exact_ok") &&
        col("nd_ok") && col("samp_ok")).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_input"),
        sum("s1").as("n_quality"),
        sum("s2").as("n_exact"),
        sum("s3").as("n_neardup"),
        sum("s4").as("n_sampled"),
        sum(col("doc_id") * col("s4")).as("kept_id_sum"))
      .orderBy("lang")
  }

  /** SCD2 history build (slowly-changing-dimension type 2 — dataset
    * versioning for a feature/dimension store): treat `events` as a
    * change log of each user's `event_type` attribute and compress
    * consecutive equal values into validity intervals. Gaps-and-islands:
    * a change flag (`lag` differs) cumulatively summed becomes the
    * version number; one aggregation per (user, version) yields the
    * interval; `lead(valid_from)` closes it (NULL = current version).
    *
    * Scale shape: both window passes AND the aggregation are partitioned
    * by user_id — no global window, one shuffle on user_id reused across
    * all three (Catalyst collapses the sort orders); versions-per-user is
    * bounded by events-per-user, so no hot reducer beyond the user key
    * itself (which the salted paths cover if a user floods). Epochs in
    * exact microseconds, valid_to left as int64 so the NULL-open interval
    * survives the parquet⇄oracle round trip without dtype ambiguity. */
  private val qScdMerge: Q = (s, d) => {
    val wRow = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ep"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wRow).isNull ||
          lag(col("event_type"), 1).over(wRow) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        wRow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ep")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .select(col("user_id"), col("version").cast("int").as("version"),
        col("event_type"), col("valid_from"), col("valid_to"),
        col("n_events"))
      .orderBy("user_id", "version")
  }

  /** Corpus snapshot diff — the dataset-versioning operator: classify
    * every document as added / removed / changed between two corpus
    * versions by content digest, emitting O(changes) rows (unchanged docs
    * are filtered before the output ever materializes). The fixture's
    * "new" version is a deterministic transform of the same table
    * (id%31==0 removed; id%17==0 edited; id%41==0 re-added under a
    * shifted id), so the DuckDB oracle replays both versions exactly.
    *
    * Scale shape: each side reduces to (doc_id, 16-byte md5) map-side —
    * full texts never shuffle — then ONE full-outer sort-merge join on
    * doc_id classifies membership. At 100 TB the old side is the
    * previous version's published digest manifest (computed once per
    * version, the way [[graft.sources.StorageOps.publishVersioned]]
    * artifacts chain), so an incremental diff costs one scan of the new
    * version plus a join of two digest manifests. Absent digests are
    * surfaced as '' (not NULL) so the diff row is totally ordered and
    * engine-portable. */
  private val qSnapshotDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val oldV = docs.select(col("doc_id"), md5(col("text")).as("old_md5"))
    val newV = docs.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" [v2]")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 41 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" [new]")).as("text")))
      .select(col("doc_id"), md5(col("text")).as("new_md5"))
    oldV.join(newV, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .filter(col("old_md5").isNull || col("new_md5").isNull ||
        col("old_md5") =!= col("new_md5"))
      .select(col("doc_id"), col("status"),
        coalesce(col("old_md5"), lit("")).as("old_md5"),
        coalesce(col("new_md5"), lit("")).as("new_md5"))
      .orderBy("doc_id")
  }

  /** Context-window size (tokens) and shard fan-out for q_seq_pack.
    * The window is sized to the fixture's ~60-token docs so boundary
    * straddling is actually exercised; production windows (2k-8k) are the
    * same constant. */
  val PackWindow = 128
  val PackShards = 2

  /** Sequence packing — the layout step that concatenates documents into
    * fixed [[PackWindow]]-token training windows (wasting no window tail
    * on short docs; straddling docs split across window boundaries).
    * Streams are per (lang, shard): monolingual context windows, the
    * usual packing discipline. Declarative formulation: within each
    * packing stream, a doc's start offset is the running token total
    * before it (one window-function pass), and its first/last context
    * windows are integer divisions of the offsets — no per-row state
    * machine, no collect.
    *
    * Scale shape: ONE exchange on (lang, shard) + a partition-local
    * running sum. `shard` (phash mod [[PackShards]]) is the parallelism
    * dial: packing streams per language at 100 TB would otherwise bound
    * parallelism by language count; sharding trades stream count for
    * executor fan-out with deterministic assignment. */
  private val qSeqPack: Q = (s, d) => {
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        (Tables.phash(col("doc_id")) % PackShards).as("shard"),
        // empty docs still occupy a slot boundary: floor at 1 token
        greatest(size(TextRules.tokens(col("text"))), lit(1))
          .cast("long").as("n_tok"))
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tok"),
        col("off"),
        expr(s"off div $PackWindow").as("win_start"),
        expr(s"(off + n_tok - 1) div $PackWindow").as("win_end"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_seq_pack" -> qSeqPack,
    "q_pipeline_e2e" -> qPipelineE2e,
    "q_scd_merge" -> qScdMerge,
    "q_range_join" -> qRangeJoin,
    "q_text_boilerplate" -> qTextBoilerplate,
    "q_stratified_sample" -> qStratifiedSample,
    "q_group_sample" -> qGroupSample,
    "q_token_hist" -> qTokenHist,
    "q_text_normalize" -> qTextNormalize,
    "q_quality_filter" -> qQualityFilter,
    "q_interval_join" -> qIntervalJoin,
    "q_lm_score" -> qLmScore,
  )

  /** Shared shingle CTE — MUST mirror DedupOps.shingles exactly,
    * including the DocTokenCap prefix slice (the Spark side of
    * q_text_boilerplate and q_pipeline_e2e shingles through DedupOps). */
  private val shingleCte =
    s"""WITH toks AS (
      |  SELECT doc_id, (list_filter(string_split_regex(lower(text), '\\W+'),
      |                             x -> x <> ''))[:${DedupOps.DocTokenCap}] AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) g)""".stripMargin

  val oracles: Map[String, String] = Map(
    // replays both fixture versions from the same table; md5 of the same
    // UTF-8 bytes is engine-portable (both emit lowercase hex)
    "q_snapshot_diff" ->
      """WITH oldv AS (SELECT doc_id, md5(text) AS old_md5 FROM documents),
        |newv AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 17 = 0 THEN text || ' [v2]'
        |                  ELSE text END) AS new_md5
        |  FROM documents WHERE doc_id % 31 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000, md5(text || ' [new]')
        |  FROM documents WHERE doc_id % 41 = 0),
        |j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_md5, n.new_md5
        |  FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id)
        |SELECT doc_id,
        |       CASE WHEN old_md5 IS NULL THEN 'added'
        |            WHEN new_md5 IS NULL THEN 'removed'
        |            ELSE 'changed' END AS status,
        |       coalesce(old_md5, '') AS old_md5,
        |       coalesce(new_md5, '') AS new_md5
        |FROM j
        |WHERE old_md5 IS NULL OR new_md5 IS NULL OR old_md5 <> new_md5
        |ORDER BY doc_id""".stripMargin,
    "q_seq_pack" -> {
      val ph = Tables.phashSql("doc_id")
      s"""WITH d AS (
        |  SELECT doc_id, lang, $ph % $PackShards AS shard,
        |         CAST(greatest(len(list_filter(
        |           string_split_regex(lower(text), '\\W+'), x -> x <> '')), 1)
        |           AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, lang, shard, n_tok,
        |         CAST(coalesce(sum(n_tok) OVER (
        |           PARTITION BY lang, shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS off
        |  FROM d)
        |SELECT doc_id, lang, shard, n_tok, off,
        |       off // $PackWindow AS win_start,
        |       (off + n_tok - 1) // $PackWindow AS win_end
        |FROM o ORDER BY doc_id""".stripMargin
    },
    "q_scd_merge" ->
      """WITH log AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ep
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                   OR lag(event_type) OVER w <> event_type
        |                 THEN 1 ELSE 0 END AS chg
        |  FROM log
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)),
        |versioned AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ep, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |            AS version
        |  FROM flagged),
        |islands AS (
        |  SELECT user_id, version, event_type,
        |         min(ep) AS valid_from, count(*) AS n_events
        |  FROM versioned GROUP BY 1, 2, 3)
        |SELECT user_id, version, event_type, valid_from,
        |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |         AS valid_to,
        |       n_events
        |FROM islands ORDER BY user_id, version""".stripMargin,
    "q_pipeline_e2e" -> (shingleCte + s""",
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |good AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
      |dropb AS (SELECT DISTINCT doc_b AS doc_id FROM good),
      |qual AS (
      |  SELECT d.doc_id, d.lang,
      |         (len(t) >= 10 AND len(t) <= 1000
      |          AND CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
      |              / len(t) >= 2.0
      |          AND CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
      |              / len(t) <= 12.0
      |          AND CAST(len(list_filter(t, x -> x = 'the')) AS DOUBLE)
      |              / len(t) <= 0.2) AS quality_ok
      |  FROM documents d JOIN toks ON d.doc_id = toks.doc_id),
      |fp AS (
      |  SELECT doc_id,
      |         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
      |  FROM documents),
      |keeper AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY 1),
      |flags AS (
      |  SELECT q.doc_id, q.lang, q.quality_ok,
      |         (fp.doc_id = k.keep_id) AS exact_ok,
      |         (d.doc_id IS NULL) AS nd_ok,
      |         (${graft.Tables.phashSql("q.doc_id")} % 100 <
      |           CASE WHEN q.lang = 'en' THEN 5 ELSE 20 END) AS samp_ok
      |  FROM qual q
      |  JOIN fp ON q.doc_id = fp.doc_id
      |  JOIN keeper k ON fp.f = k.f
      |  LEFT JOIN dropb d ON q.doc_id = d.doc_id)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_input,
      |       CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_quality,
      |       CAST(sum(CASE WHEN quality_ok AND exact_ok THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_exact,
      |       CAST(sum(CASE WHEN quality_ok AND exact_ok AND nd_ok
      |         THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
      |       CAST(sum(CASE WHEN quality_ok AND exact_ok AND nd_ok AND samp_ok
      |         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |       CAST(sum(CASE WHEN quality_ok AND exact_ok AND nd_ok AND samp_ok
      |         THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
      |FROM flags GROUP BY 1 ORDER BY 1""").stripMargin,
    // the oracle states the SEMANTICS (a plain range join — DuckDB's
    // IEJoin handles it); the Spark side is the bucketed decomposition
    "q_range_join" ->
      s"""WITH iv AS (
         |  SELECT o_orderkey,
         |         epoch_us(o_orderdate) // 86400000000 AS start_day
         |  FROM orders
         |  WHERE ${graft.Tables.phashSql("o_orderkey")} % 100 < 2),
         |p AS (
         |  SELECT l_quantity,
         |         epoch_us(l_shipdate) // 86400000000 AS ship_day
         |  FROM lineitem)
         |SELECT i.o_orderkey,
         |       CAST(count(*) AS BIGINT) AS n_shipped,
         |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
         |FROM iv i JOIN p
         |  ON p.ship_day BETWEEN i.start_day AND i.start_day + $RangeJoinW
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_boilerplate" -> (shingleCte + """,
      |ndocs AS (SELECT count(*) AS nd FROM documents),
      |common AS (
      |  SELECT shingle FROM sh, ndocs
      |  GROUP BY shingle, nd HAVING count(DISTINCT doc_id) >= nd * 0.05)
      |SELECT s.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_shingles,
      |       CAST(sum(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_common,
      |       CAST(sum(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*) AS boiler_ratio,
      |       (CAST(sum(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*)) <= 0.3 AS keep
      |FROM sh s LEFT JOIN common c ON s.shingle = c.shingle
      |GROUP BY s.doc_id ORDER BY s.doc_id""").stripMargin,
    "q_stratified_sample" ->
      s"""WITH k AS (
         |  SELECT lang, doc_id,
         |         CASE WHEN ${graft.Tables.phashSql("doc_id")} % 100 <
         |                   (CASE WHEN lang = 'en' THEN 5 ELSE 20 END)
         |              THEN 1 ELSE 0 END AS kept
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(kept) AS BIGINT) AS n_kept,
         |       CAST(sum(doc_id * kept) AS BIGINT) AS kept_id_sum
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q_group_sample" ->
      s"""SELECT lang, doc_id, rk FROM (
         |  SELECT lang, doc_id,
         |         CAST(row_number() OVER (
         |           PARTITION BY lang
         |           ORDER BY ${graft.Tables.phashSql("doc_id")}, doc_id) AS INT) AS rk
         |  FROM documents)
         |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin,
    "q_token_hist" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
        |                              x -> x <> '')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT n // 20 AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(n) AS min_toks, max(n) AS max_toks
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_normalize" ->
      """SELECT doc_id,
        |       CAST(length(trim(regexp_replace(regexp_replace(lower(text),
        |              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INT) AS norm_len,
        |       md5(trim(regexp_replace(regexp_replace(lower(text),
        |              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     x -> x <> '') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, lang,
        |         CAST(len(toks) AS BIGINT) AS n,
        |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
        |           AS sum_len,
        |         CAST(len(list_filter(toks, x -> x = 'the')) AS BIGINT) AS n_the
        |  FROM t),
        |r AS (
        |  SELECT doc_id, lang,
        |         (CASE WHEN n < 10 OR n > 1000 THEN 1 ELSE 0 END) +
        |         (CASE WHEN n > 0 AND (CAST(sum_len AS DOUBLE) / n < 2.0
        |                 OR CAST(sum_len AS DOUBLE) / n > 12.0) THEN 2 ELSE 0 END) +
        |         (CASE WHEN n > 0 AND CAST(n_the AS DOUBLE) / n > 0.2
        |               THEN 4 ELSE 0 END)
        |           AS reasons
        |  FROM m)
        |SELECT lang, reasons, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                            x -> x <> '')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, count(*) AS tf FROM t GROUP BY 1),
        |tot AS (SELECT count(*) AS total FROM t)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |       round(avg(ln(CAST(tf.tf AS DOUBLE) / tot.total)), 4) AS avg_logprob
        |FROM t JOIN tf ON t.tok = tf.tok, tot
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "q_interval_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ep
        |  FROM events)
        |SELECT e.event_id,
        |       CAST(sum(CASE WHEN p.pep IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_nearby
        |FROM (SELECT event_id, user_id, ep FROM ev WHERE event_type = 'error') e
        |LEFT JOIN (SELECT user_id, ep AS pep FROM ev
        |           WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND abs(p.pep - e.ep) <= 600000000
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
  )
}

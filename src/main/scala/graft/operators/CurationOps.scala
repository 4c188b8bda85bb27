package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Metrics, Tables}

/** Corpus-curation operators a training-data pipeline runs beside the
  * dedup/quality family:
  *
  *   - q_metrics_funnel: the observability surface (reference:
  *     Ors2MetricsExport.java, Ors2MetricsConstants.java:22-44 — per-stage
  *     rows/bytes counters exported to Prometheus). Here each funnel stage
  *     is instrumented with [[graft.Metrics.instrument]] (`observe()` /
  *     CollectMetricsExec), so the counters ride the one execution of the
  *     plan instead of re-running lineage per counter; the query RETURNS
  *     the metrics table itself, oracle-checked against DuckDB recomputing
  *     each stage independently.
  *     EAGER CONTRACT: Observation values exist only after an action, so
  *     unlike every other registered query this builder RUNS the funnel
  *     (one corpus pass) at construction and returns the tiny metrics
  *     table — build it only to execute it. Plan inspection must use
  *     [[instrumentedFunnel]] instead, which returns the lazy instrumented
  *     plan (DumpPlans dumps that one).
  *   - q_decontaminate: benchmark decontamination — flag training docs
  *     sharing any word-8-gram with a held-out benchmark set (the standard
  *     train/test-overlap hygiene step before LLM training). Grams are
  *     compared by xxhash64: like the MinHash family, parity with the
  *     string-joining oracle is probabilistic — a 64-bit collision between
  *     distinct grams would diverge the two (P ~ n²/2^65; negligible at
  *     fixture scale, and at corpus scale a collision only over-flags).
  *     Join strategy is left to Catalyst/AQE rather than a broadcast hint:
  *     when the bench side is a real eval suite (MBs vs TBs of training
  *     text) AQE broadcasts it at runtime from its ACTUAL size; when the
  *     bench side is large — as in this fixture's 5%-of-corpus split, which
  *     at 100 TB would be a multi-GB set no executor should hold — the same
  *     plan degrades gracefully to a shuffled hash join on 8-byte hashes.
  *     Either way no wide shuffle of text, one groupBy(doc_id) over hashes.
  *   - q_gopher_repeat: Gopher-style repetition quality signals, an
  *     occurrence-count adaptation of Rae et al. 2021 §A1.1 (the paper
  *     measures top-2..4-gram and duplicate-5..10-gram fractions over
  *     CHARACTERS; the counts here are token-occurrence numerators /
  *     denominators for the 2-gram top and 3-gram duplicate cases — same
  *     signal family, not the paper's exact definition). Both are PURE
  *     per-document array expressions — whole-stage-codegen map work, zero
  *     shuffles; at 100 TB this runs at scan speed alongside the other
  *     quality gates.
  *     Counts are emitted as exact integers (numerator/denominator) so the
  *     oracle hash-compares without float-rounding hazards; the fractions
  *     are cnt/total downstream.
  */
object CurationOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Word n-gram strings over a `toks` array column — same construction
    * as DedupOps.shingles' 3-gram CASE, width-parameterized. Distinct per
    * doc (set semantics, like shingles). */
  private def ngramsExpr(n: Int): String = {
    val join = (0 until n).map(j => s"toks[i+$j]").mkString(", ' ', ")
    s"""CASE WHEN size(toks) >= $n
       |  THEN array_distinct(transform(sequence(0, size(toks)-$n),
       |         i -> concat($join)))
       |  ELSE array() END""".stripMargin
  }

  /** Width of the decontamination grams (13 is common for exact-match
    * decontamination; 8 suits this corpus' ~60-token docs — both are the
    * same plan). */
  val DecontamGramWidth = 8

  /** Deterministic benchmark membership: phash(doc_id) % 20 == 1 (~5% of
    * docs stand in for the held-out eval suite). Pure arithmetic, so the
    * DuckDB oracle reproduces the exact same split. */
  private def isBench(c: Column): Column = Tables.phash(c) % 20 === 1

  private val qDecontaminate: Q = (s, d) => {
    // gram construction is the CPU stage: spread the single-split fixture
    // by doc_id (also pre-partitions the downstream groupBy)
    val grams = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), TextRules.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(expr(ngramsExpr(DecontamGramWidth))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
    // bench gram-hash set: no broadcast hint — AQE picks broadcast when the
    // runtime size is actually small (external eval suite) and falls back
    // to a shuffled hash join when it is not (this 5%-of-corpus split at
    // 100 TB would OOM executors if force-broadcast); see object scaladoc
    val bench = grams.filter(isBench(col("doc_id"))).select("h").distinct()
    grams.filter(!isBench(col("doc_id")))
      .join(bench, "h")
      .groupBy("doc_id")
      // per-doc grams are distinct and bench is distinct on h, so each
      // (doc, h) survives at most once; count = distinct overlap size
      .agg(count(lit(1)).as("n_hit"))
      .orderBy("doc_id")
  }

  /** Bloom-prefiltered decontamination — same contract as
    * q_decontaminate (flag train docs sharing any 8-gram with the bench
    * set, exact n_hit), but the 100 TB hard-guarantee path: a Bloom
    * filter over the bench gram hashes is built once (driver-side
    * aggregate — the real-world bench side is an eval suite, MBs not
    * TBs) and broadcast; corpus grams are prefiltered map-side by
    * mightContain BEFORE any wide exchange, so the join's build input
    * shrinks from |corpus grams| to |true hits| + ~0.1% false
    * positives, and the exact semi-join then removes those FPs — the
    * result is EXACTLY q_decontaminate's, which is why both share one
    * oracle. This is the same shape as Spark's own injected runtime
    * bloom filter (InjectRuntimeFilter), made explicit so the pruning
    * is guaranteed rather than cost-model-dependent; the probe is a
    * scalar long->bool UDF over the broadcast sketch, the one place a
    * UDF beats any expressible Column (Spark's BloomFilterMightContain
    * is not public API). */
  private val qBloomDecontaminate: Q = (s, d) => {
    val grams = graft.Caching.persist(Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), TextRules.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(expr(ngramsExpr(DecontamGramWidth))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h")))
    val benchH = grams.filter(isBench(col("doc_id"))).select("h").distinct()
    val nBench = benchH.count().max(1L)
    val bloom = benchH.stat.bloomFilter("h", nBench, 0.001)
    val bloomBc = s.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomBc.value.mightContainLong(h))
    grams.filter(!isBench(col("doc_id")))
      .filter(mightContain(col("h")))
      .join(benchH, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"))
      .orderBy("doc_id")
  }

  private val qGopherRepeat: Q = (s, d) =>
    // spread: pure map-side CPU over a single-split fixture; the gram
    // arrays are MATERIALIZED by one projection each (a lambda referencing
    // the gram-construction expression directly would rebuild all the
    // concat work per distinct element)
    Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id"), TextRules.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        expr(grams(2)).as("bg"), expr(grams(3)).as("tg"))
      .select(col("doc_id"), col("n_tokens"),
        // top: occurrence count of the most frequent 2-gram (Gopher's
        // top-n-gram numerator) — O(d·u) per doc over the materialized
        // array, per-doc CPU at any corpus size
        expr("""CAST(coalesce(array_max(transform(array_distinct(bg),
               |  x -> size(filter(bg, y -> y = x)))), 0) AS BIGINT)"""
          .stripMargin).as("top2_cnt"),
        size(col("bg")).cast("long").as("n_bigrams"),
        // dup: 3-grams occurring more than once = total - distinct
        // (duplicated-n-gram numerator)
        (size(col("tg")) - size(array_distinct(col("tg")))).cast("long")
          .as("dup3_cnt"),
        size(col("tg")).cast("long").as("n_trigrams"))
      .orderBy("doc_id")

  /** Overlapping (non-distinct) n-gram array over `toks`. */
  private def grams(n: Int): String = {
    val join = (0 until n).map(j => s"toks[i+$j]").mkString(", ' ', ")
    s"""(CASE WHEN size(toks) >= $n
       |  THEN transform(sequence(0, size(toks)-$n), i -> concat($join))
       |  ELSE CAST(array() AS array<string>) END)""".stripMargin
  }

  /** The LAZY instrumented funnel: the quality-stage frame with all three
    * observation points attached, plus the stage handles. This is the plan
    * that actually executes (and the one DumpPlans records); resolve the
    * handles only after running an action on the frame. */
  def instrumentedFunnel(s: SparkSession, d: String)
      : (DataFrame, Seq[Metrics.Stage]) = {
    val chars = "chars" -> sum(length(col("text"))).cast("long")
    val (ingest, mIngest) =
      Metrics.instrument(Tables.documents(s, d), "ingest", chars)
    val (lang, mLang) =
      Metrics.instrument(ingest.filter(col("lang") === "en"), "lang", chars)
    val kept = lang
      .withColumn("toks", TextRules.tokens(col("text")))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(TextRules.qualityOk(col("toks"), col("n")))
    val (quality, mQuality) = Metrics.instrument(kept, "quality", chars)
    (quality, Seq(mIngest, mLang, mQuality))
  }

  // EAGER by contract (see object scaladoc): runs the funnel at
  // construction — the returned metrics table cannot exist before the
  // instrumented plan's action.
  private val qMetricsFunnel: Q = (s, d) => {
    import s.implicits._
    val (quality, stages) = instrumentedFunnel(s, d)
    // ONE action materializes all three observation points
    quality.count()
    stages.zipWithIndex
      .map { case (m, i) =>
        (s"${i + 1}_${m.name}", m.rows, m.metricLong("chars")) }
      .toDF("stage", "n_rows", "chars")
      .orderBy("stage")
  }

  /** PII detector patterns — the standard pre-training redaction/filter
    * families (emails, NANP-style phone numbers, IPv4 addresses). The
    * patterns deliberately use only syntax with identical semantics in
    * java.util.regex (Spark) and RE2 (DuckDB): character classes, bounded
    * repetition, ASCII \b word boundaries — no lookaround, no backrefs.
    * Keyed map so downstream gates can pick families individually. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "n_email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "n_phone" -> """\b\d{3}[-.]\d{3}[-.]\d{4}\b""",
    "n_ip" -> """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""",
  )

  /** Per-doc PII counts over a text column: one `regexp_count` projection
    * per family plus the gate flag — pure map-side expression work, zero
    * shuffles, scan-speed at any corpus size (same shape as the quality
    * gates). */
  def piiFlags(text: Column): Seq[Column] = {
    val counts = PiiPatterns.map { case (name, pat) =>
      regexp_count(text, lit(pat)).cast("long").as(name)
    }
    counts :+ counts.map(c => c > 0).reduce(_ || _).as("has_pii")
  }

  /** The fixture corpus is PII-free word salad (no digits, no '@'), which
    * would make a detector query a dead signal. q_pii_flag therefore runs
    * the REAL detectors over a seeded view: docs with phash(doc_id)%5 ∈
    * {1,2,3} get one deterministic synthetic email / phone / IP appended —
    * pure doc_id arithmetic, so the DuckDB oracle renders the identical
    * corpus and the comparison exercises the actual regex semantics across
    * engines (the parity hazard a PII gate lives or dies on). On a real
    * corpus, apply [[piiFlags]] to the raw text column directly. */
  /** The deterministic PII-seeded text column both detector queries run
    * over (see [[qPiiFlag]]'s scaladoc for why the fixture is seeded). */
  private def seededPii: Column = {
    val h = Tables.phash(col("doc_id")) % 5
    concat(col("text"),
      when(h === 1, concat(lit(" reach me at user"), col("doc_id"),
        lit("@mail.example.com"))).otherwise(lit("")),
      when(h === 2, concat(lit(" call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(h === 3, concat(lit(" host 10."), col("doc_id") % 256,
        lit(".0."), (col("doc_id") * 7) % 256)).otherwise(lit("")))
  }

  private val qPiiFlag: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id") +: piiFlags(seededPii): _*)
      .orderBy("doc_id")

  /** Placeholder token per PII family — digit- and '@'-free on purpose,
    * so a later family's pattern can never match inside an earlier
    * family's replacement (the substitution order below is then safely
    * the declaration order of [[PiiPatterns]]). */
  val PiiTokens: Map[String, String] = Map(
    "n_email" -> "<EMAIL>", "n_phone" -> "<PHONE>", "n_ip" -> "<IP>")

  /** Redact all PII families from a text column (declaration order). */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, lit(pat), lit(PiiTokens(name)))
    }

  /** SQL twin of [[seededPii]] (one source for both PII oracles).
    * DuckDB standard string literals are raw (no backslash escapes), so
    * the java-regex pattern strings pass through unmodified. NOT
    * stripMargin'd here: both embedding templates strip once at the end,
    * and a second strip would eat one pipe of each line-leading `||`. */
  private def piiSeededCteSql: String = {
    val ph = Tables.phashSql("doc_id")
    s"""WITH s AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN $ph % 5 = 1
      |      THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
      |             || '@mail.example.com' ELSE '' END ||
      |    CASE WHEN $ph % 5 = 2
      |      THEN ' call 415-555-'
      |             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END ||
      |    CASE WHEN $ph % 5 = 3
      |      THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
      |             || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
      |      AS seeded
      |  FROM documents)"""
  }

  private def piiCountsSql: String =
    PiiPatterns.map { case (name, pat) =>
      s"CAST(len(regexp_extract_all(seeded, '$pat')) AS BIGINT) AS $name"
    }.mkString(",\n      |       ")

  /** The redaction ACTION the flag query points at: replace every match
    * of every family with its placeholder token, emitting the
    * pre-redaction counts plus the md5 of the redacted text — the same
    * byte-exactness contract as q_text_normalize, so a single differing
    * character between the engines' regex substitutions fails the gate.
    * Pure map-side expression work (regexp_replace chain in one
    * projection), zero shuffles, scan-speed at any corpus size. DuckDB
    * replays with the 'g' flag (its regexp_replace defaults to
    * first-match; Spark replaces all). */
  private val qPiiRedact: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id") +:
        PiiPatterns.map { case (name, pat) =>
          regexp_count(seededPii, lit(pat)).cast("long").as(name)
        } :+ md5(piiRedact(seededPii)).as("redacted_md5"): _*)
      .orderBy("doc_id")

  /** Deterministic source mixing — the step that assembles a training
    * mixture from weighted sources (e.g. "2 epochs of wiki, 0.25 of CC";
    * Gao et al. 2020 The Pile §2, Touvron et al. 2023 table 1). Rates are
    * permille epochs: a doc yields `rate div 1000` whole copies plus one
    * more iff phash(doc_id) mod 1000 < rate mod 1000 — integer-epoch
    * upsampling and hash-fraction downsampling in one rule, reproducible
    * on any cluster and in the oracle (no rand()). Shuffle-free: the
    * sampling decision and the copy explosion are per-row expression
    * work; at 100 TB the output lands partitioned exactly like the scan. */
  def mix(docs: DataFrame, rateExpr: Column): DataFrame =
    docs.withColumn("rate", rateExpr)
      .withColumn("copies", expr("rate div 1000") +
        when(Tables.phash(col("doc_id")) % 1000 < col("rate") % 1000, 1)
          .otherwise(0))
      // sequence(1, 0) would generate a DESCENDING [1, 0] — guard to empty
      .withColumn("copy",
        explode(expr("CASE WHEN copies >= 1 THEN sequence(1, copies) " +
          "ELSE CAST(array() AS array<int>) END")))

  /** Fixture mixture: source srcN gets 2000/1000/500/250 permille epochs
    * by N mod 4 — upsampling (2x), identity, and two downsampling rates
    * all exercised. */
  private def fixtureRate: Column =
    expr("""CASE CAST(substring(source, 4) AS INT) % 4
           |  WHEN 0 THEN 2000 WHEN 1 THEN 1000 WHEN 2 THEN 500
           |  ELSE 250 END""".stripMargin)

  /** Per-source mixture audit over the mixed rows: input docs, output
    * rows, and a selection checksum (sum of phash×copies — pins WHICH
    * docs were sampled, not just how many). */
  private val qDataMix: Q = (s, d) =>
    mix(Tables.documents(s, d), fixtureRate)
      .groupBy("source")
      // distinct docs = rows with copy 1 (each sampled doc has exactly
      // one): a count_distinct here would force a second aggregation
      // exchange on (source, doc_id)
      .agg(sum(when(col("copy") === 1, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_out"),
        sum(Tables.phash(col("doc_id"))).as("sel_check"))
      .orderBy("source")

  /** Per-source token budget for q_source_budget: sized so the fixture's
    * ~60-token docs truncate mid-source (25 docs ≈ 1500 tokens/source);
    * production budgets (e.g. RefinedWeb's per-domain caps) are the same
    * constant scaled. */
  val SourceTokenBudget = 800L

  /** Per-source (domain) TOKEN-budget cap — the RefinedWeb-style guard
    * against a single domain dominating the training mix, budgeted in
    * tokens rather than doc count (what the training run actually
    * consumes): within each source, rank docs by quality — stopword hits
    * desc (natural text first; same lexicon as q_text_quality), token
    * count desc, doc_id — and keep docs while the running token total
    * stays within [[SourceTokenBudget]]. Integer-only sort keys: no
    * float-ordering hazard between engines.
    *
    * Scale shape: ONE exchange on source, then rank + running sum ride
    * the SAME partition-local sort (one window spec — Spark plans a
    * single Window operator). Sources at 100 TB are domains (millions of
    * groups) so the window parallelizes; a mega-domain is a hot
    * partition — the same skew class, and remedy, as q_vocab_build's
    * bucketed rank. Output is O(kept docs). */
  private val qSourceBudget: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("stop_cnt").desc, col("n_tok").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(TextRules.tokens(col("text"))).cast("long").as("n_tok"),
        regexp_count(lower(col("text")), lit("\\b(the|a|of|to|and|in|is)\\b"))
          .as("stop_cnt"))
      .withColumn("rk", row_number().over(w))
      .withColumn("cum_tok", sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tok") <= SourceTokenBudget)
      .select(col("source"), col("doc_id"), col("rk"), col("n_tok"),
        col("cum_tok"))
      .orderBy("source", "rk")
  }

  /** One-pass corpus profile (the "data card" report): per (source,
    * lang) — doc count, exact token and char totals, mean doc length,
    * and how many docs are exact duplicates of some other corpus doc
    * (canonical fingerprint, corpus-wide). The summary every curation
    * run publishes next to its output.
    *
    * Scale shape: tokenize/fingerprint are map-side projections; the
    * only exchanges are the fingerprint df groupBy (16-byte digests) and
    * the final (source, lang) aggregation over a bounded domain. The
    * join back to per-doc rows is AQE-planned from the dup-digest
    * table's runtime size (duplicate digests only — usually tiny). */
  private val qCorpusProfile: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("lang"), col("n_chars"),
        size(TextRules.tokens(col("text"))).cast("long").as("ntok"),
        Tables.fingerprint(col("text")).as("fp"))
    val dupFps = docs.groupBy("fp").agg(count(lit(1)).as("fpn"))
      .filter(col("fpn") >= 2)
    docs.join(dupFps, Seq("fp"), "left")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").as("total_tokens"),
        sum("n_chars").as("total_chars"),
        round(avg(col("ntok").cast("double")), 4).as("mean_tokens"),
        sum(when(col("fpn").isNotNull, 1L).otherwise(0L)).as("dup_docs"))
      .orderBy("source", "lang")
  }

  /** DSIR hashed-feature space size. Production uses 10k+ buckets (the
    * paper's 10^4); the fixture's ~30-word vocabulary yields ~10^3
    * distinct uni+bigrams, so 64 buckets keeps every bucket populated
    * and the oracle's bucket table readable while exercising the exact
    * production shape (the bucket count only changes a literal). */
  val DsirBuckets = 64

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-doc log importance
    * weight log p_target(x)/q_raw(x) under hashed uni+bigram bag-of-ngram
    * distributions — the signal a pipeline resamples raw data by to match
    * a high-quality target corpus. Target here = the corpus' own
    * quality-gated slice ([[TextRules.qualityOk]] — the in-repo stand-in
    * for "formal text"); raw = the whole corpus. Per bucket b:
    * p_b = (tc_b + 1)/(T + B) Laplace-smoothed, q_b likewise over raw
    * counts, and a doc's weight sums occ_f * ln(p_b(f)/q_b(f)) over its
    * feature occurrences.
    *
    * Scale shape: one (doc, slot) partial-agg exchange (slots are the
    * hashed feature space — bounded domain, B = [[DsirBuckets]]), the
    * bucket table is a B-row broadcast, totals ride a broadcast 1-row
    * aggregate, and the per-doc weight reuses the (doc, slot) frame — no
    * corpus-width shuffle of text, no second tokenization pass.
    * Determinism: bucket log-ratios are pure scalars over exact integer
    * counts; the per-doc sum is order-dependent at the last ulp and
    * rounds to 4 decimals (the q_lm_score convention). Docs with zero
    * tokens have no features and emit no row (stated; the quality gate
    * would exclude them from any resample anyway). */
  private val qDsirWeights: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextRules.tokens(col("text")).as("toks"))
    val qual = docs.select(col("doc_id"),
      TextRules.qualityOk(col("toks"), size(col("toks")).cast("long"))
        .as("is_target"))
    // uni+bigram features → portable md5-derived slot (the q_doc_winnow
    // hash convention; oracle replays it bit-for-bit)
    val feats = docs.select(col("doc_id"), explode(expr(
        """concat(toks, CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks)-2),
          |                 i -> concat(toks[i], ' ', toks[i+1]))
          |  ELSE array() END)""".stripMargin)).as("g"))
      .select(col("doc_id"),
        (expr("CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT) " +
          "% 1000000007") % lit(DsirBuckets)).cast("int").as("slot"))
    // NOT persisted (r17 optimization round finding): `ds` feeds both the
    // bucket aggregation and the final weight join, but both consumers
    // hang off the same (doc_id, slot) partial-agg exchange and
    // ReuseExchange already deduplicates it — the md5 feature pass runs
    // once either way (A/B at sf0.1: persist read 2.45-2.9s vs 2.44s
    // without, a wash minus the cache-write overhead).
    val ds = feats.groupBy("doc_id", "slot").agg(count(lit(1)).as("occ"))
      .join(qual, "doc_id")
    val buckets = ds.groupBy("slot").agg(
      sum("occ").as("rc"),
      sum(when(col("is_target"), col("occ")).otherwise(0L)).as("tc"))
    val tot = buckets.agg(sum("rc").as("r"), sum("tc").as("t"))
    val lr = buckets.crossJoin(broadcast(tot))
      .select(col("slot"), log(
        (col("tc").cast("double") + lit(1.0)) * (col("r") + lit(DsirBuckets))
          / ((col("rc").cast("double") + lit(1.0))
            * (col("t") + lit(DsirBuckets)))).as("lr"))
    ds.join(broadcast(lr), "slot")
      .groupBy("doc_id", "is_target")
      .agg(sum("occ").as("n_feats"),
        round(sum(col("occ") * col("lr")), 4).as("dsir_logw"))
      .select("doc_id", "n_feats", "is_target", "dsir_logw")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_dsir_weights" -> qDsirWeights,
    "q_corpus_profile" -> qCorpusProfile,
    "q_decontaminate" -> qDecontaminate,
    "q_bloom_decontaminate" -> qBloomDecontaminate,
    "q_gopher_repeat" -> qGopherRepeat,
    "q_metrics_funnel" -> qMetricsFunnel,
    "q_pii_flag" -> qPiiFlag,
    "q_pii_redact" -> qPiiRedact,
    "q_data_mix" -> qDataMix,
    "q_source_budget" -> qSourceBudget,
  )

  private val toksCte =
    """WITH t AS (
      |  SELECT doc_id, lang, text,
      |         list_filter(string_split_regex(lower(text), '\W+'),
      |                     x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  private def gramSql(n: Int): String =
    (1 to n).map(j => s"toks[i+${j - 1}]").mkString(" || ' ' || ")

  val oracles: Map[String, String] = Map(
    // hash mirror = the q_doc_winnow md5-hex-prefix convention; quality
    // mirror = q_quality_filter's gate; range(1, len(t)) is empty for
    // len <= 1, so the bigram leg needs no CASE on the DuckDB side
    // (Spark's sequence() would count DOWN for size < 2, hence its CASE)
    "q_dsir_weights" ->
      s"""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
        |                             x -> x <> '') AS t
        |  FROM documents),
        |qual AS (
        |  SELECT doc_id,
        |         (n >= 10 AND n <= 1000
        |          AND CAST(sum_len AS DOUBLE) / n >= 2.0
        |          AND CAST(sum_len AS DOUBLE) / n <= 12.0
        |          AND CAST(n_the AS DOUBLE) / n <= 0.2) AS is_target
        |  FROM (SELECT doc_id, len(t) AS n,
        |               list_sum(list_transform(t, x -> length(x))) AS sum_len,
        |               len(list_filter(t, x -> x = 'the')) AS n_the
        |        FROM toks)),
        |grams AS (
        |  SELECT doc_id,
        |         unnest(list_concat(t,
        |           list_transform(range(1, len(t)),
        |                          i -> t[i] || ' ' || t[i + 1]))) AS g
        |  FROM toks),
        |ds AS (
        |  SELECT doc_id,
        |         CAST(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)
        |              % 1000000007 % $DsirBuckets AS INT) AS slot,
        |         count(*) AS occ
        |  FROM grams GROUP BY 1, 2),
        |b AS (
        |  SELECT slot, sum(occ) AS rc,
        |         sum(CASE WHEN is_target THEN occ ELSE 0 END) AS tc
        |  FROM ds JOIN qual USING (doc_id) GROUP BY 1),
        |tot AS (SELECT sum(rc) AS r, sum(tc) AS t FROM b),
        |lr AS (
        |  SELECT slot,
        |         ln((CAST(tc AS DOUBLE) + 1.0) * (r + $DsirBuckets)
        |            / ((CAST(rc AS DOUBLE) + 1.0) * (t + $DsirBuckets))) AS lr
        |  FROM b, tot)
        |SELECT ds.doc_id, CAST(sum(ds.occ) AS BIGINT) AS n_feats,
        |       qual.is_target,
        |       round(sum(ds.occ * lr.lr), 4) AS dsir_logw
        |FROM ds JOIN lr USING (slot) JOIN qual USING (doc_id)
        |GROUP BY 1, 3 ORDER BY doc_id""".stripMargin,
    // tokenizer mirror = q_text_tokens' proven split; fingerprint mirror
    // = Tables.fingerprint's documented DuckDB twin
    "q_corpus_profile" ->
      """WITH docs AS (
        |  SELECT source, lang, n_chars,
        |         len(list_filter(string_split_regex(lower(text), '\W+'),
        |             x -> x <> '')) AS ntok,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |dup AS (SELECT fp, count(*) AS fpn FROM docs
        |        GROUP BY 1 HAVING count(*) >= 2)
        |SELECT source, lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(ntok) AS BIGINT) AS total_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       round(avg(ntok), 4) AS mean_tokens,
        |       CAST(sum(CASE WHEN dup.fpn IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS dup_docs
        |FROM docs LEFT JOIN dup USING (fp)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_source_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |         CAST(len(list_filter(string_split_regex(lower(text), '\\W+'),
         |                              x -> x <> '')) AS BIGINT) AS n_tok,
         |         CAST(len(regexp_extract_all(lower(text),
         |                  '\\b(the|a|of|to|and|in|is)\\b')) AS BIGINT) AS stop_cnt
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, n_tok,
         |         CAST(row_number() OVER (
         |           PARTITION BY source
         |           ORDER BY stop_cnt DESC, n_tok DESC, doc_id) AS INT) AS rk,
         |         sum(n_tok) OVER (
         |           PARTITION BY source
         |           ORDER BY stop_cnt DESC, n_tok DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
         |  FROM t)
         |SELECT source, doc_id, rk, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
         |FROM r WHERE cum_tok <= $SourceTokenBudget
         |ORDER BY source, rk""".stripMargin,
    "q_data_mix" -> {
      val ph = Tables.phashSql("doc_id")
      s"""WITH c AS (
      |  SELECT doc_id, source,
      |         r // 1000 + CASE WHEN $ph % 1000 < r % 1000
      |                     THEN 1 ELSE 0 END AS copies
      |  FROM (
      |    SELECT doc_id, source,
      |           CASE CAST(substring(source, 4) AS INT) % 4
      |             WHEN 0 THEN 2000 WHEN 1 THEN 1000 WHEN 2 THEN 500
      |             ELSE 250 END AS r
      |    FROM documents))
      |SELECT source,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(sum(copies) AS BIGINT) AS n_out,
      |       CAST(sum($ph * copies) AS BIGINT) AS sel_check
      |FROM c WHERE copies >= 1
      |GROUP BY source ORDER BY source""".stripMargin
    },
    "q_pii_flag" -> {
      s"""$piiSeededCteSql,
      |c AS (
      |  SELECT doc_id,
      |       $piiCountsSql
      |  FROM s)
      |SELECT doc_id, n_email, n_phone, n_ip,
      |       (n_email > 0 OR n_phone > 0 OR n_ip > 0) AS has_pii
      |FROM c ORDER BY doc_id""".stripMargin
    },
    // the redaction twin: DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all; the md5 pins the substitution byte-exact
    "q_pii_redact" -> {
      val redacted = PiiPatterns.foldLeft("seeded") { case (e, (name, pat)) =>
        s"regexp_replace($e, '$pat', '${PiiTokens(name)}', 'g')"
      }
      s"""$piiSeededCteSql
      |SELECT doc_id,
      |       $piiCountsSql,
      |       md5($redacted) AS redacted_md5
      |FROM s ORDER BY doc_id""".stripMargin
    },
    "q_decontaminate" -> (toksCte + s""",
      |g AS (
      |  SELECT DISTINCT doc_id, ${gramSql(DecontamGramWidth)} AS gram
      |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - ${DecontamGramWidth - 2})) AS i) gi
      |  WHERE len(toks) >= $DecontamGramWidth),
      |bench AS (
      |  SELECT DISTINCT gram FROM g
      |  WHERE ${Tables.phashSql("doc_id")} % 20 = 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
      |FROM g
      |WHERE ${Tables.phashSql("doc_id")} % 20 <> 1
      |  AND gram IN (SELECT gram FROM bench)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // The bloom prefilter is exactness-preserving (FPs die in the exact
    // join), so the bloom path shares the plain decontamination oracle.
    "q_bloom_decontaminate" -> (toksCte + s""",
      |g AS (
      |  SELECT DISTINCT doc_id, ${gramSql(DecontamGramWidth)} AS gram
      |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - ${DecontamGramWidth - 2})) AS i) gi
      |  WHERE len(toks) >= $DecontamGramWidth),
      |bench AS (
      |  SELECT DISTINCT gram FROM g
      |  WHERE ${Tables.phashSql("doc_id")} % 20 = 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
      |FROM g
      |WHERE ${Tables.phashSql("doc_id")} % 20 <> 1
      |  AND gram IN (SELECT gram FROM bench)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_gopher_repeat" -> (toksCte + s""",
      |g AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |         CASE WHEN len(toks) >= 2
      |           THEN list_transform(range(1, len(toks)), i -> ${gramSql(2)})
      |           ELSE [] END AS bg,
      |         CASE WHEN len(toks) >= 3
      |           THEN list_transform(range(1, len(toks) - 1), i -> ${gramSql(3)})
      |           ELSE [] END AS tg
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |       CAST(coalesce(list_max(list_transform(list_distinct(bg),
      |              x -> len(list_filter(bg, y -> y = x)))), 0) AS BIGINT)
      |         AS top2_cnt,
      |       CAST(len(bg) AS BIGINT) AS n_bigrams,
      |       CAST(len(tg) - len(list_distinct(tg)) AS BIGINT) AS dup3_cnt,
      |       CAST(len(tg) AS BIGINT) AS n_trigrams
      |FROM g ORDER BY doc_id""".stripMargin),
    "q_metrics_funnel" -> (toksCte + """,
      |m AS (
      |  SELECT doc_id, lang, text,
      |         CAST(len(toks) AS BIGINT) AS n,
      |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
      |           AS sum_len,
      |         CAST(len(list_filter(toks, x -> x = 'the')) AS BIGINT) AS n_the
      |  FROM t)
      |SELECT '1_ingest' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS chars
      |FROM documents
      |UNION ALL
      |SELECT '2_lang', CAST(count(*) AS BIGINT),
      |       CAST(coalesce(sum(length(text)), 0) AS BIGINT)
      |FROM documents WHERE lang = 'en'
      |UNION ALL
      |SELECT '3_quality', CAST(count(*) AS BIGINT),
      |       CAST(coalesce(sum(length(text)), 0) AS BIGINT)
      |FROM m
      |WHERE lang = 'en' AND n >= 10 AND n <= 1000
      |  AND CAST(sum_len AS DOUBLE) / n >= 2.0
      |  AND CAST(sum_len AS DOUBLE) / n <= 12.0
      |  AND CAST(n_the AS DOUBLE) / n <= 0.2
      |ORDER BY stage""".stripMargin),
  )
}

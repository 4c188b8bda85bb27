package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Near-duplicate detection family for training-data pipelines —
  * generalizes the reference's similarity matcher (SimilarityUtils.java:21-41)
  * from prefix equality to shingle/Jaccard, MinHash+LSH and SimHash.
  *
  * All three queries emit the same output contract: candidate pairs that
  * pass an EXACT Jaccard >= 0.8 verification, ordered (doc_a, doc_b). The
  * sketches differ only in HOW candidates are generated:
  *   - q_ngram_jaccard: exact blocked join on shared shingles (ground truth;
  *     quadratic in docs-per-shingle — the baseline).
  *   - q_text_minhash: 64 MinHash permutations, banded r=1/b=64 → candidate
  *     iff some permutation's min collides. P(miss | J>=0.8) <= 0.2^64.
  *   - q_text_simhash: 64-bit SimHash, 16 nibble bands (pigeonhole: hamming
  *     <= 15 implies a band collides) + hamming <= 15 gate. Wide bands are
  *     needed because unweighted SimHash over small shingle sets (60-90 per
  *     doc) flips several bits per differing shingle.
  *
  * Scale notes (100 TB): the exact path's shingle self-join explodes on hot
  * shingles; MinHash bounds the join to 64 rows/doc regardless of doc size,
  * and the band join is a plain hash-shuffle on (band, value) — the standard
  * web-scale dedup topology. The exact verification then touches only
  * candidate pairs. At 1000 executors you'd salt hot (band, value) buckets
  * and cap bucket width; the per-doc signature is O(shingles × 64) map-side
  * work with no skew.
  */
object DedupOps {
  private type Q = (SparkSession, String) => DataFrame
  private val P = 1000000007L

  /** (doc_id, shingle): distinct word-3-gram shingles per document. */
  def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(lower(text), '\\\\W+'), x -> x != '')").as("toks"))
      .select(col("doc_id"),
        explode(expr(
          """CASE WHEN size(toks) >= 3
            |  THEN array_distinct(transform(sequence(0, size(toks)-3),
            |         i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))
            |  ELSE array() END""".stripMargin)).as("shingle"))

  /** Exact-Jaccard verification of candidate pairs (doc_a, doc_b):
    * intersection via shingle join, sizes via per-doc counts. */
  private def verifyExact(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("za.n") + col("zb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Ground truth: blocked exact n-gram Jaccard (pairs sharing a shingle). */
  private val qNgramJaccard: Q = (s, d) => {
    val sh = shingles(s, d)
    val cand = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyExact(cand, sh)
  }

  /** MinHash + banded LSH (r=1, b=64), then exact verification. */
  private val qTextMinhash: Q = (s, d) => {
    val sh = shingles(s, d)
    val hashed = sh.select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val minh = hashed
      .select(col("doc_id"), pmod(col("h"), lit(P)).as("hp"),
        explode(expr("sequence(0, 63)")).as("band"))
      .withColumn("a", (col("band") * 2 + 1) * lit(2654435761L) % lit(P))
      .withColumn("hv", pmod(col("a") * col("hp") + col("band") * lit(40503L), lit(P)))
      .groupBy("doc_id", "band").agg(min("hv").as("minhash"))
    val cand = minh.as("x").join(minh.as("y"),
        col("x.band") === col("y.band") && col("x.minhash") === col("y.minhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyExact(cand, sh)
  }

  /** SimHash (64-bit, unweighted shingle hashes), 8-byte band blocking +
    * hamming <= 6, then exact verification. */
  private val qTextSimhash: Q = (s, d) => {
    val sh = shingles(s, d)
    val hashed = sh.select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val sim = hashed
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 63)")).as("j"))
      .select(col("doc_id"), col("j"),
        (expr("shiftrightunsigned(h, j)") % 2 * 2 - 1).as("pm"))
      .groupBy("doc_id", "j").agg(sum("pm").as("sgn"))
      .select(col("doc_id"),
        when(col("sgn") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
          .otherwise(lit(0L)).as("bitval"))
      .groupBy("doc_id").agg(sum("bitval").as("simhash"))
    val bands = sim.select(col("doc_id"), col("simhash"),
      explode(expr("sequence(0, 15)")).as("k"))
      .withColumn("nib", expr("shiftrightunsigned(simhash, k * 4)") % 16)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.k") === col("y.k") && col("x.nib") === col("y.nib") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
      .distinct()
      .filter(expr("bit_count(sim_a ^ sim_b) <= 15"))
      .select("doc_a", "doc_b")
    verifyExact(cand, sh)
  }

  val queries: Map[String, Q] = Map(
    "q_ngram_jaccard" -> qNgramJaccard,
    "q_text_minhash" -> qTextMinhash,
    "q_text_simhash" -> qTextSimhash,
  )

  /** Exact ground-truth pair SQL — all three sketches must converge to it
    * (their candidate recall at J>=0.8 is ~1 by construction). */
  private val exactPairsSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'),
      |                             x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) g),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ngram_jaccard" -> exactPairsSql,
    "q_text_minhash" -> exactPairsSql,
    "q_text_simhash" -> exactPairsSql,
  )
}

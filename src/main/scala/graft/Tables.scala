package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared loaders for the driver-generated parquet tables (TESTDATA.md)
  * plus engine-neutral helpers used to keep every derived value exactly
  * reproducible in the DuckDB oracle (SURVEY.md §7 "DuckDB oracle parity").
  *
  * Scale notes (100 TB design): loaders read parquet through the standard
  * DataSource V2 path, so filter pushdown / column pruning / partition
  * pruning all apply; nothing here forces a materialization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Every loader passes the chaos gate ([[Chaos.gate]]): a no-op returning
    * the scan untouched unless the conf-probability fault injection is
    * enabled (test harness only). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Chaos.gate(spark, spark.read.parquet(s"$dir/$name.parquet"))

  /** Fixture-typing guard for date columns, mirroring [[events]]' ts
    * normalization in the other direction: operators consume
    * `l_shipdate`/`o_orderdate` as timestamps, but a fixture generated
    * with TIMESTAMP(NANOS) parquet arrives as int64 nanos under
    * `nanosAsLong`. Convert that case back to a timestamp (µs
    * truncation — exact for these date-precision fixtures); the oracles
    * (`epoch_us`, `strftime`, DATE casts) already work under both
    * parquet typings on the DuckDB side. POST-EPOCH assumption, stated:
    * `div 1000` truncates toward zero, so a pre-1970 (negative-nanos)
    * value would round opposite to DuckDB's floor-based `epoch_us`;
    * these fixtures are all post-1990, and any pre-epoch fixture must
    * switch this to a floor division. */
  private def nanosToTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame =
    nanosToTs(table(s, d, "lineitem"), "l_shipdate")
  def orders(s: SparkSession, d: String): DataFrame =
    nanosToTs(table(s, d, "orders"), "o_orderdate")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** `events` with `ts` normalized to int64 epoch NANOS whatever the
    * fixture generation typed it: parquet TIMESTAMP(NANOS) already
    * arrives as int64 nanos (`nanosAsLong`), while TIMESTAMP(MICROS)
    * arrives as TIMESTAMP_NTZ and is converted here (session TZ is UTC,
    * so the NTZ→TIMESTAMP cast is exact). Downstream operators and every
    * DuckDB oracle then share ONE contract — ts = nanos since epoch on
    * the Spark side, `epoch_us(ts)`/`epoch_ms(ts)` on the oracle side —
    * and a fixture-schema change cannot silently shift semantics. The
    * conversion is a pure projection (column pruning still reaches the
    * scan); only a raw min/max-ts pushdown is lost, which no query here
    * relies on. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Canonical exact-dedup fingerprint: md5 of whitespace-normalized
    * lowercase text — ONE definition for q_text_fingerprint,
    * q_doc_dedup_exact and the e2e funnel's exact-dedup stage (the
    * DuckDB mirror is `md5(trim(regexp_replace(lower(text), '\s+', ' ',
    * 'g')))`). */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))

  /** Spread a DataFrame across the cluster before CPU-heavy per-row work.
    * The test fixtures are single-row-group parquet files — one input
    * split — so without this, an O(n) shuffle-free stage (or worse, an
    * O(n²) nested-loop join streaming this side) runs on ONE core. The
    * round-robin exchange costs O(n) rows; use it only where the stage it
    * feeds does super-constant work per row (sketching, all-pairs
    * scoring, wide HLL updates). On production layouts with splittable
    * files the scan already yields many partitions and this exchange can
    * be dropped — it is load-spreading, not a semantic operator. */
  def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  /** Knuth multiplicative hash over int64 — plain arithmetic, so Spark and
    * DuckDB produce identical values (unlike `hash()`/`crc32()`, which are
    * engine-specific; see SURVEY.md §7 risks). The input is reduced mod P
    * first so the multiply cannot overflow int64 for ANY non-negative
    * input ((P-1)*K ≈ 2.65e18 < 2^63); for inputs < P the reduction is an
    * identity, so values are unchanged for the fixture id domains. Mirrors
    * the role of the reference's partition hashing
    * (Ors2BypassShuffleWriter.scala:48-54). */
  def phash(c: Column): Column =
    ((c % lit(1000000007L)) * lit(2654435761L)) % lit(1000000007L)

  /** Same hash in DuckDB SQL, for oracle queries. */
  def phashSql(expr: String): String =
    s"(((($expr) % 1000000007) * 2654435761) % 1000000007)"

  /** Exact decimal(18,2) cast: double→decimal rounding is
    * round-half-away-from-zero in both engines, and binary doubles are never
    * exactly at a .005 midpoint, so the cast is engine-neutral. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-insensitive exact sum of a currency-like double column, returned
    * as double: sum in exact decimal, cast at the end. Safe to hash-compare
    * against `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` in DuckDB. */
  def sumd2(c: Column): Column = sum(dec2(c)).cast("double")
}

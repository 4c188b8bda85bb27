package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation utilities for the 100 TB path (SURVEY.md §7 risks,
  * SCALING.md): when one group key dominates, a single reducer receives the
  * whole key. Two-stage salted aggregation spreads a hot key over `salts`
  * reducers and merges the partials — the classic remedy the reference
  * side-steps at the transport layer with worker groups
  * (Ors2ShuffleManager.scala:330-364).
  *
  * AQE's skew-join handling covers joins automatically; this covers
  * aggregation, where AQE cannot split a single group.
  *
  * Salt derivation: `pmod(xxhash64(all columns), salts)` — DETERMINISTIC
  * per row. An id- or rand()-based salt is recomputed differently when a
  * lost shuffle map partition is re-run from nondeterministically-ordered
  * input, so fetched and recomputed map outputs disagree and rows are
  * duplicated or dropped on retry (the SPARK-23207 failure class). The
  * full-row hash is stable under recompute by construction. Trade-off:
  * rows that are EXACT full duplicates share a salt, so a hot key whose
  * rows are byte-identical copies is not spread — pre-aggregate such
  * inputs to (row, multiplicity) first (`q_dedup_exact` shape), or append
  * a distinguishing column before salting.
  */
object SkewOps {

  /** Stable per-row salt in [0, salts): hash of every column. */
  private def rowHashSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong))
      .cast("int")

  /** sum/count of `value` per `key`, aggregated in two salted stages.
    * For exact domains (integral/decimal), the result is identical to
    * `df.groupBy(key).agg(sum, count)` for any salt assignment; for
    * floating-point values the two-stage sum reassociates additions, so
    * low-order bits may differ (cast to decimal first if hash-comparing).
    * The salt only spreads reducer load.
    *
    * Output columns are `sumCol`/`cntCol` (defaults `sum_<value>`/`cnt`);
    * pass explicit names if the input already uses the defaults. The
    * intermediate salt column is uniquely named per call so it can never
    * clobber a caller column. */
  def saltedSumCount(df: DataFrame, key: String, value: String, salts: Int,
      sumCol: String = null, cntCol: String = null): DataFrame = {
    val outSum = Option(sumCol).getOrElse("sum_" + value)
    val outCnt = Option(cntCol).getOrElse("cnt")
    val salt = s"__graft_salt_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df
      // full-row hash: stable under task recompute (see object doc); and
      // unlike a (key, value)-only hash it still spreads when the hot key
      // carries one constant value but other columns vary
      .withColumn(salt, rowHashSalt(df, salts))
      .groupBy(col(key), col(salt))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(outSum),
        sum(col("_pcnt")).as(outCnt))
  }

  /** Inner equi-join with explicit key salting: each `left` row gets a
    * salt in [0, salts); `right` is replicated once per salt value; the
    * join key becomes (key, salt). A hot key's left rows then spread over
    * `salts` reducers instead of funneling into one, and every left row
    * still meets each matching right row exactly once (at its own salt
    * replica) — so the result is EXACTLY the plain inner join, for ANY
    * salt assignment (which is also why the deterministic row-hash salt
    * costs nothing in correctness).
    *
    * When to prefer this over AQE's OptimizeSkewedJoin (which stays the
    * default answer): AQE can only split a skewed partition when the
    * exchange is free to re-plan — a reused exchange, a required child
    * distribution (e.g. the join feeds a groupBy on the same key), or a
    * non-sort-merge plan can all pin it. Salting bakes the spread into
    * the data itself. Cost: the right side is materialized `salts`× —
    * keep it slim (project first) and salts modest. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = s"__graft_salt_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val l = left.withColumn(salt, rowHashSalt(left, salts))
    val r = right.withColumn(salt,
      explode(array((0 until salts).map(s => lit(s)): _*)))
    l.join(r, Seq(key, salt)).drop(salt)
  }

  /** Exact dedup on `keys` with a DETERMINISTIC representative — the row
    * minimal under the lexicographic order of `order` columns (ties broken
    * by the remaining columns, so the choice is total whenever rows are
    * distinct) — in two salted stages: dedup within (keys, salt), then
    * across salts. min is associative, so the staged result is EXACTLY the
    * direct single-pass result for any salt assignment.
    *
    * When this beats the direct forms on a hot key:
    *   - `row_number().over(partitionBy(keys))` ships EVERY row of the hot
    *     key to one reducer and sorts them there — the window funnel this
    *     function exists to avoid;
    *   - plain `dropDuplicates(keys)` does get a map-side partial
    *     aggregate, but its per-key state is the full representative row:
    *     on wide rows the partial buffers themselves thrash memory, and
    *     its pick is plan-dependent (whichever row each task sees first),
    *     so results drift across retries/AQE re-plans. Here the pick is
    *     reproducible on any cluster, any partitioning.
    * Both stages are hash aggregations with map-side partials; the hot
    * key's rows spread over `salts` stage-1 groups (full-row hash salt:
    * byte-identical duplicates share a salt, but those collapse in the
    * map-side partial before ever shuffling). */
  def saltedDedup(df: DataFrame, keys: Seq[String], order: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = s"__graft_salt_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val rest = df.columns.filterNot(c => keys.contains(c) || order.contains(c))
    val payloadCols = (order ++ rest).toIndexedSeq
    val payload = struct(payloadCols.map(col): _*)
    df.withColumn(salt, rowHashSalt(df, salts))
      .groupBy((keys.map(col) :+ col(salt)): _*)
      .agg(min(payload).as("_rep"))          // stage 1: dedup within salt
      .groupBy(keys.map(col): _*)
      .agg(min(col("_rep")).as("_rep"))      // stage 2: dedup across salts
      .select(df.columns.toIndexedSeq.map { c =>
        if (keys.contains(c)) col(c) else col(s"_rep.$c").as(c)
      }: _*)
  }

  // ---- registered query: the zipfian ledger flood ----------------------
  // The blocks fixture's (map_id, attempt_id, seq_id) key space cannot
  // skew (seq_id is a per-group row_number), so the salted path needs its
  // own fixture: a ledger derived from `events` where ~80% of rows land on
  // map_id 0 and seq_id has only 4 values — one composite key holds ~20%
  // of the table. The dedup keeps the earliest (attempt_id, event_id) row
  // per (map_id, seq_id), the resend-wins-by-first-attempt rule.

  private type QT = (SparkSession, String) => DataFrame

  private val qDedupSalted: QT = (s, d) => {
    val ph = Tables.phash(col("event_id"))
    val skewed = Tables.events(s, d).select(
      col("event_id"),
      when(ph % 5 < 4, lit(0L)).otherwise(ph % 8).as("map_id"),
      (Tables.phash(col("user_id")) % 4).as("seq_id"),
      (col("event_id") % 7).as("attempt_id"),
      length(col("props")).cast("long").as("length"))
    saltedDedup(skewed, keys = Seq("map_id", "seq_id"),
        order = Seq("attempt_id", "event_id"), salts = 16)
      .select("map_id", "seq_id", "attempt_id", "event_id", "length")
      .orderBy("map_id", "seq_id")
  }

  val queries: Map[String, QT] = Map("q_dedup_salted" -> qDedupSalted)

  val oracles: Map[String, String] = Map(
    "q_dedup_salted" -> {
      val phe = Tables.phashSql("event_id")
      val phu = Tables.phashSql("user_id")
      s"""WITH skewed AS (
        |  SELECT event_id,
        |         CASE WHEN ($phe) % 5 < 4 THEN 0
        |              ELSE ($phe) % 8 END AS map_id,
        |         ($phu) % 4 AS seq_id,
        |         event_id % 7 AS attempt_id,
        |         CAST(length(props) AS BIGINT) AS length
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY map_id, seq_id
        |            ORDER BY attempt_id, event_id) AS rn
        |  FROM skewed)
        |SELECT map_id, seq_id, attempt_id, event_id, length
        |FROM r WHERE rn = 1 ORDER BY map_id, seq_id""".stripMargin
    })
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}

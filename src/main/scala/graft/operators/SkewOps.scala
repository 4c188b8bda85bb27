package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object SkewOps {

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
      // row-unique salt: a value-derived salt collapses when the hot key
      // carries one constant value (the classic skew case) — the id-based
      // salt spreads regardless of the value distribution
      .withColumn(salt, pmod(monotonically_increasing_id(), lit(salts)))
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
    * replica) — so the result is EXACTLY the plain inner join.
    *
    * When to prefer this over AQE's OptimizeSkewedJoin (which stays the
    * default answer): AQE can only split a skewed partition when the
    * exchange is free to re-plan — a reused exchange, a required child
    * distribution (e.g. the join feeds a groupBy on the same key), or a
    * non-sort-merge plan can all pin it. Salting bakes the spread into
    * the data itself. Cost: the right side is materialized `salts`× —
    * keep it slim (project first) and salts modest.
    *
    * The left salt is id-based, not key/value-based, for the same reason
    * as [[saltedSumCount]]: hot keys usually carry near-constant values,
    * which would collapse a value-derived salt. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = s"__graft_salt_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val l = left.withColumn(salt,
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val r = right.withColumn(salt,
      explode(array((0 until salts).map(s => lit(s)): _*)))
    l.join(r, Seq(key, salt)).drop(salt)
  }
}

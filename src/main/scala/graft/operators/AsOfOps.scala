package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generalized as-of join — the point-in-time lookup Spark lacks natively,
  * as a reusable library operator (q_asof_join is one instantiation).
  *
  * For each left row, attach the value of the LATEST right row with the
  * same key and right.time <= left.time (backward as-of; the convention of
  * time-series stores). Composed from existing operators per the
  * preference order: union both sides, one key-partitioned window pass
  * carrying the last seen right row forward.
  *
  * Scale shape: ONE shuffle (partition by key) + partition-local sort —
  * O(n log n) with no range-join row explosion and no per-key collect.
  * Skewed keys behave like any windowed aggregate (the window is
  * partitioned by key, so a hot key lands on one reducer; salt upstream
  * if a single key exceeds a task).
  *
  * Join semantics on NULLs: right rows with a null key or null time never
  * match (filtered out — NULL matches nothing, as in any join), and a
  * left row with a null key gets a null result. A null rightVALUE is a
  * real value: if the latest visible right row carries null, the output
  * is null (the whole row is carried, not the last non-null value).
  *
  * Tie rule: a right row AT the same timestamp as a left row IS visible
  * (<=, not <) — right rows sort before left rows at equal times. Ties
  * among right rows at the same (key, time) resolve to the largest
  * `tieBreak` value (the last one the window passes over), so pass a
  * unique tie-break column for a deterministic result.
  */
object AsOfOps {

  private val reserved = Seq("__k", "__t", "__side", "__pack")

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column, leftTime: Column,
      rightKey: Column, rightTime: Column,
      rightValue: Column,
      tieBreak: Column,
      out: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    require(leftCols.intersect(reserved :+ out).isEmpty,
      s"asofJoin: left columns may not include ${(reserved :+ out).mkString(", ")}")

    val tbType = right.select(tieBreak).schema.head.dataType
    val vType = right.select(rightValue).schema.head.dataType
    val packType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tb", tbType),
      org.apache.spark.sql.types.StructField("v", vType)))

    val l = left
      .withColumn("__k", leftKey).withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__pack", lit(null).cast(packType))
    // NULL matches nothing: right rows with null key/time can never be
    // the as-of row for any left row — drop them before the union
    val r = right
      .select(rightKey.as("__k"), rightTime.as("__t"),
        lit(0).as("__side"),
        struct(tieBreak.as("tb"), rightValue.as("v")).as("__pack"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
    // pad the right side to the left's schema in ONE projection (a
    // per-column withColumn fold stacks O(n) Projects on wide schemas)
    val rPadded = r.select(
      (r.columns.map(col) ++ leftCols.filterNot(r.columns.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c))).toSeq: _*)

    // right rows (side 0) sort before left rows (side 1) at equal times:
    // that is what makes the <= visibility rule hold. The PACKED struct
    // is carried (last non-null STRUCT = latest right ROW), so a null
    // rightValue on the latest row is returned as null, not skipped.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__pack.tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rPadded.select(l.columns.map(col).toSeq: _*))
      .withColumn(out,
        when(col("__k").isNotNull,
          last(col("__pack"), ignoreNulls = true).over(w).getField("v")))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(out)).toSeq: _*)
  }
}

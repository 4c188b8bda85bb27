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
  * carrying the last seen right value forward.
  *
  * Scale shape: ONE shuffle (partition by key) + partition-local sort —
  * O(n log n) with no range-join row explosion and no per-key collect.
  * Skewed keys behave like any windowed aggregate (the window is
  * partitioned by key, so a hot key lands on one reducer; salt upstream
  * if a single key exceeds a task).
  *
  * Tie rule: a right row AT the same timestamp as a left row IS visible
  * (<=, not <) — right rows sort before left rows at equal times. Ties
  * among right rows at the same (key, time) resolve to the largest
  * `tieBreak` value (the last one the window passes over), so pass a
  * unique tie-break column for a deterministic result.
  */
object AsOfOps {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column, leftTime: Column,
      rightKey: Column, rightTime: Column,
      rightValue: Column,
      tieBreak: Column,
      out: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__k", leftKey).withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(
        right.select(rightValue).schema.head.dataType))
      .withColumn("__tb", lit(null).cast(
        right.select(tieBreak).schema.head.dataType))
    val r = right
      .select(rightKey.as("__k"), rightTime.as("__t"),
        lit(0).as("__side"), rightValue.as("__v"), tieBreak.as("__tb"))
    // right rows (side 0) sort before left rows (side 1) at equal times:
    // that is what makes the <= visibility rule hold
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rPadded = leftCols.foldLeft(r)((df, c) =>
      if (Seq("__k", "__t", "__side", "__v", "__tb").contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    l.unionByName(rPadded.select(l.columns.map(col).toSeq: _*))
      .withColumn(out, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(out)).toSeq: _*)
  }
}

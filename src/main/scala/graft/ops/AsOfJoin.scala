package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right-side row at or before each left row's time,
  * per key) — the time-series operator Spark has no built-in for.
  *
  * Implementation is the scalable union + carry-forward shape, NOT a
  * range join: tag both sides, ONE shuffle on the key, sort within
  * partitions by (time, side, tiebreak), and carry the right side's
  * values forward with `last(..., ignoreNulls)`. Cost is one shuffle +
  * one sort regardless of how many right rows precede each left row —
  * a range join would be quadratic per key. Rows on the right with the
  * SAME timestamp as a left row match (ASOF >= semantics); ties among
  * right rows resolve to the largest tiebreak (deterministic).
  */
object AsOfJoin {

  /** leftDf/rightDf must share keyCol, tsCol and tieCol names. Returns
    * the left rows + `asof_ts` / `asof_tie` columns from the matched
    * right row (null when no right row precedes).
    */
  def asOf(leftDf: DataFrame, rightDf: DataFrame,
           keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val left = leftDf.select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("side", lit(1))
    val right = rightDf.select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("side", lit(0))
    // right (side 0) sorts before left (side 1) at equal ts => >= match
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightTs: Column = when(col("side") === 0, col(tsCol))
    val rightTie: Column = when(col("side") === 0, col(tieCol))
    right.unionByName(left)
      .withColumn("asof_ts", last(rightTs, ignoreNulls = true).over(w))
      .withColumn("asof_tie", last(rightTie, ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .drop("side")
  }
}

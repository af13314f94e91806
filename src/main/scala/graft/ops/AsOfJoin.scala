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
    * ALL of the left side's columns + `asof_ts` / `asof_tie` from the
    * matched right row (null when no right row precedes). Left payload
    * columns ride through the union null-filled on the right side —
    * no post-hoc re-join on a possibly non-unique (key, ts, tie)
    * triple is needed. The right side's payload columns do not
    * propagate (project them into `tieCol` or pre-join them on
    * (key, asof_ts, asof_tie) if needed).
    */
  def asOf(leftDf: DataFrame, rightDf: DataFrame,
           keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    // the three working/output names would silently clobber (withColumn
    // replaces "side") or collide with same-named left payload columns
    val reserved = Seq("side", "asof_ts", "asof_tie")
    val clash = leftDf.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"asOf: left columns ${clash.mkString(", ")} collide with reserved " +
        "output names side/asof_ts/asof_tie — rename them before joining")
    val left = leftDf.withColumn("side", lit(1))
    val right = rightDf.select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("side", lit(0))
    // right (side 0) sorts before left (side 1) at equal ts => >= match
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightTs: Column = when(col("side") === 0, col(tsCol))
    val rightTie: Column = when(col("side") === 0, col(tieCol))
    // allowMissingColumns: left-only payload columns become null on the
    // right-side rows (dropped again by the side filter)
    right.unionByName(left, allowMissingColumns = true)
      .withColumn("asof_ts", last(rightTs, ignoreNulls = true).over(w))
      .withColumn("asof_tie", last(rightTie, ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .drop("side")
      .select((leftDf.columns.map(col) :+ col("asof_ts") :+ col("asof_tie")): _*)
  }
}

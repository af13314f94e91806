package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the streaming
  * counterpart of the batch sessionize/segment metrics (q07/q08):
  * per-window, per-type event counts that a pipeline-health dashboard
  * reads while ingest is running.
  *
  * Semantics: append mode emits a window only once the watermark (max
  * observed event time minus `lateness`) passes its end — late events
  * inside the allowed lateness still count; later ones are dropped.
  * State is bounded by (windows in flight x types): watermarking is
  * what makes this runnable forever at 10^12-doc ingest rates.
  */
object StreamingWindows {

  /** rows: a streaming Dataset with `ts` (timestamp) and `event_type`. */
  def windowedCounts(rows: DataFrame,
                     windowLen: String = "1 minute",
                     lateness: String = "2 minutes"): DataFrame =
    rows
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"))

  /** Batch reference of the same aggregation over the same rows,
    * restricted to the windows append mode would have emitted (window
    * end <= final watermark = max(ts) - lateness). Used by the parity
    * test; also the "backfill" query a user runs over historical data.
    */
  def batchEmittedCounts(rows: DataFrame, windowLen: String = "1 minute",
                         latenessSecs: Long = 120L): DataFrame = {
    // empty input / all-null ts -> max() is null: nothing would have
    // been emitted, return the (empty) aggregation instead of NPE-ing
    val maxRow = rows.agg(max(unix_timestamp(col("ts")))).head()
    val wm = if (maxRow.isNullAt(0)) Long.MinValue
      else maxRow.getLong(0) - latenessSecs
    rows.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"))
      .filter(unix_timestamp(col("w_end")) <= wm)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics helpers. */
object Stats {

  /** Column name for a percentile: 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9. */
  def pName(p: Double): String = {
    val pct = p * 100
    if (pct == math.rint(pct)) s"p${pct.round}"
    else "p" + pct.toString.replace('.', '_')
  }

  /** Approximate per-group percentiles — the 100×-SCALE SIBLING of the
    * exact interpolated `percentile` used by the q30 parity query.
    *
    * The exact form buffers every value of a group in aggregation state
    * (DuckDB `quantile_cont` hash parity requires it), so with few
    * groups the buffers are corpus-sized — fine at bench scale, wrong
    * at 100×. `approx_percentile` (Greenwald–Khanna) keeps
    * O(accuracy · log n) state per group REGARDLESS of corpus size and
    * is map-side combinable, with guaranteed rank error ≤ n/accuracy:
    * at the default accuracy 10000 the returned value sits within
    * ±0.01·n ranks of the true quantile. Use this form on the cluster;
    * q30 stays the exact parity recipe (the same relationship as
    * `minhashSignaturesFast` to the md5 oracle form).
    *
    * Output: `groupCols ++ percentiles.map(pName)` — one column per
    * requested percentile (0.5 -> `p50`), double-typed.
    */
  def approxPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        percentiles: Seq[Double],
                        accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1]: $percentiles")
    // ONE sketch per group serves every requested percentile (the
    // array form), instead of one aggregation state per (group, p)
    val sketch = percentile_approx(col(valueCol),
      array(percentiles.map(lit): _*), lit(accuracy)).as("_ps")
    val grouped = df.groupBy(groupCols.map(col): _*).agg(sketch)
    val outCols: Seq[Column] = groupCols.map(col) ++
      percentiles.zipWithIndex.map { case (p, i) =>
        col("_ps").getItem(i).cast("double").as(pName(p))
      }
    grouped.select(outCols: _*)
  }
}

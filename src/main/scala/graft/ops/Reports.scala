package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report-prep aggregations behind the reference's Dynamic Reports tab
  * (SQL_DATA_INTEGRATION_TOOL.py:1213-1294 `generate_dynamic_graph`):
  * bar/line need (x, numeric y); pie uses `groupby(x)[y].sum()` when x≠y and
  * `value_counts()` otherwise. The chart rendering itself is GUI concern;
  * what the engine owns is producing the (small) aggregated chart data from
  * an arbitrarily large result — a partial-aggregated groupBy, never a
  * driver-side pandas conversion of the full result set (ref 1229).
  */
object Reports {

  /** Pie/bar data: sum of `y` per `x` (ref 1262 `df.groupby(x)[y].sum()`).
    * Decimal-exact sum (deterministic under any partial-agg order), surfaced
    * as double. */
  def groupSum(df: DataFrame, x: String, y: String): DataFrame =
    df.groupBy(col(x))
      .agg(sum(col(y).cast("decimal(18,4)")).cast("double").as(s"sum_$y"))
      .orderBy(col(x))

  /** Pie fallback when x == y (ref 1264 `value_counts()`). */
  def valueCounts(df: DataFrame, x: String): DataFrame =
    df.groupBy(col(x).as("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))

  /** Line data: mean of y per x with count, ordered by x. */
  def groupAvg(df: DataFrame, x: String, y: String): DataFrame =
    df.groupBy(col(x))
      .agg(
        (sum(col(y).cast("decimal(18,4)")).cast("double") / count(lit(1))).as(s"avg_$y"),
        count(lit(1)).as("n"))
      .orderBy(col(x))

  /** The "Export Report" action (ref 1297-1357) minus the matplotlib part:
    * persist chart data + the full result table as CSV/JSON next to a tiny
    * manifest, distributed write (no driver materialization). */
  def exportReport(chartData: DataFrame, fullResult: DataFrame, outDir: String): Unit = {
    chartData.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$outDir/chart_data")
    fullResult.write.mode("overwrite").json(s"$outDir/result")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact group-wise IQR (Tukey-fence) outlier detection — the data-
  * quality screen between the repo's profile pass (Catalog.analyzeTable)
  * and its quantile bucketing (q80): flag values outside
  * [q1 − 1.5·IQR, q3 + 1.5·IQR] of their group, with the quartiles
  * taken as EXACT order statistics.
  *
  * Why order statistics and not interpolated percentiles: interpolation
  * (Spark `percentile`, DuckDB `quantile_cont`) mixes neighboring
  * values in floating point — engines disagree in the last ulp and the
  * result depends on the engine's interpolation convention. The rank-
  * select formulation — the value at 0-based rank ⌊(n−1)·q⌋ of the
  * group's sort order — picks an actual data value by integer
  * arithmetic, and the fences are DECIMAL expressions over it, so every
  * engine lands on the identical rows.
  *
  * Scale shape: one shuffle on the group key for the ranking window
  * (exact quantiles cost a per-group sort — that IS the operator; use
  * approx_percentile when 1-ulp portability doesn't matter), a group-
  * sized quartile table broadcast back, then a map-side-combined
  * summary aggregate. Nothing corpus-sized crosses the wire twice.
  *
  * The broadcast bounds GROUP CARDINALITY, not data: the quartile table
  * is one row per group, right for report-shaped group keys (status,
  * segment, day). For a high-cardinality group key (10⁸ users) pass
  * `broadcastQuartiles = false` — the join degrades to a shuffled join
  * on the group key (which the ranked side is already partitioned by)
  * instead of a driver OOM building the broadcast.
  */
object Outliers {

  /** Per-group summary: (group, n, q1, q3, n_outliers, sum_outliers).
    * `tieBreak` totalizes the sort so ranks are engine-portable even
    * though equal values make the pick value-identical either way. */
  def iqrByGroup(df: DataFrame, groupCol: String, valCol: String,
      tieBreak: String, broadcastQuartiles: Boolean = true): DataFrame = {
    val v = col(valCol).cast("decimal(18,4)")
    val w = Window.partitionBy(col(groupCol))
    // NULL values carry no rank and can't cross a fence — dropped up
    // front (also keeps Spark's NULLS FIRST vs DuckDB's NULLS LAST
    // sort default out of the rank arithmetic)
    val ranked = df.select(col(groupCol), v.as("__v"), col(tieBreak).as("__tb"))
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w.orderBy(col("__v"), col("__tb"))))
      .withColumn("__n", count(lit(1)).over(w))
    // 0-based rank ⌊(n−1)·q⌋ → 1-based row_number +1; integer arithmetic
    def pick(q: Double) =
      max(when(col("__rn") === floor((col("__n") - 1) * lit(q)).cast("long") + 1,
        col("__v"))).as(s"__q${(q * 100).toInt}")
    val quart = ranked.groupBy(col(groupCol))
      .agg(pick(0.25), pick(0.75), max(col("__n")).as("n"))
      .withColumn("__lo", col("__q25") - lit(1.5).cast("decimal(18,4)") * (col("__q75") - col("__q25")))
      .withColumn("__hi", col("__q75") + lit(1.5).cast("decimal(18,4)") * (col("__q75") - col("__q25")))
    ranked.join(if (broadcastQuartiles) broadcast(quart) else quart, groupCol)
      .groupBy(col(groupCol), col("n"), col("__q25"), col("__q75"))
      .agg(
        sum(when(col("__v") < col("__lo") || col("__v") > col("__hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        coalesce(sum(when(col("__v") < col("__lo") || col("__v") > col("__hi"), col("__v"))),
          lit(0).cast("decimal(18,4)")).cast("double").as("sum_outliers"))
      .select(col(groupCol), col("n"),
        col("__q25").cast("double").as("q1"),
        col("__q75").cast("double").as("q3"),
        col("n_outliers"), col("sum_outliers"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics with engine-portable arithmetic: per-group
  * least-squares trend and windowed anomaly flags. Both take INTEGER
  * series (counts, micro-unit amounts) so every intermediate is an
  * order-free exact sum — the §5 protocol applied to regression
  * moments, the same discipline as q82's Pearson correlation.
  */
object Trend {

  /** Per-group ordinary-least-squares line y = slope·x + intercept over
    * integer (xCol, yCol) points: closed forms
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    * with EXACT long moment sums (one partial-aggregated shuffle on the
    * group key — map-side combine, answer-sized output) and each result
    * a SINGLE IEEE division of exact operands — bit-identical across
    * engines, no accumulation-order sensitivity anywhere. The intercept
    * uses its own closed form rather than chaining through the slope, so
    * it too is one exact-operand division. Callers keep the moments in
    * long range: |Σx·Σxy| < 2⁶³ — day-index x and count/micro-unit y at
    * report-group granularity sit orders of magnitude under it.
    * Returns (group, n_pts, slope, intercept); single-x groups (den 0)
    * return NULL slope/intercept (no line is defined). */
  def linearTrend(points: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = points.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    agg.select(col(groupCol), col("n").as("n_pts"),
      when(den =!= 0L, (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") / den.cast("double")).as("slope"),
      when(den =!= 0L, (col("sy") * col("sxx") - col("sx") * col("sxy"))
        .cast("double") / den.cast("double")).as("intercept"))
  }

  /** Trailing-window anomaly screen over an integer series, ENTIRELY in
    * integer arithmetic — no float ever exists, so the flags are
    * engine-portable by construction (stronger than the decimal
    * protocol). Per group, each point's trailing window (RANGE BETWEEN
    * `window`−1 PRECEDING AND CURRENT ROW over the integer x — time-
    * based, correct across missing points, the q68 convention) yields
    * count w, sum S, sum-of-squares Q; the z-score test
    *   |x − μ| > z·σ,  μ = S/w,  σ² = (w·Q − S²)/w²
    * multiplies through by w² to the integer inequality
    *   (w·y − S)² > z²·(w·Q − S²).
    * `z2` = z² (default 4 = two sigmas). A single-point window has
    * σ² = 0 and (y·1 − y)² = 0 — never flagged, no division-by-zero
    * branch needed. One shuffle on the group key; output is
    * series-sized. */
  def anomalyFlags(series: DataFrame, groupCol: String, xCol: String,
      yCol: String, window: Int, z2: Int = 4): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(xCol).cast("long"))
      .rangeBetween(-(window - 1).toLong, 0L)
    val y = col(yCol).cast("long")
    series.select(col(groupCol), col(xCol), y.as(yCol))
      .withColumn("__w", count(lit(1)).over(w))
      .withColumn("__s", sum(col(yCol)).over(w))
      .withColumn("__q", sum(col(yCol) * col(yCol)).over(w))
      .select(col(groupCol), col(xCol), col(yCol), col("__w").as("n_win"),
        (pow2(col("__w") * col(yCol) - col("__s")) >
          lit(z2.toLong) * (col("__w") * col("__q") - col("__s") * col("__s")))
          .as("flag"))
  }

  private def pow2(c: org.apache.spark.sql.Column) = c * c
}

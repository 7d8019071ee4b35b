package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series analytics with engine-portable arithmetic: per-group
  * least-squares trend and windowed anomaly flags. Both take INTEGER
  * series (counts, micro-unit amounts); every moment is an order-free
  * EXACT sum in decimal(38,0) — the §5 protocol applied to regression
  * moments, the same discipline as q82's Pearson correlation, and the
  * exact mirror of DuckDB's HUGEINT (int128) aggregate arithmetic.
  * Decimal (not long) because the contract must be ENFORCED, not
  * documented: long moments silently wrap on micro-unit series (a
  * wrong-but-plausible slope / flipped anomaly flag), while
  * decimal(38,0) is exact through ~10³⁸, and the one remaining corner
  * — an intermediate exceeding 38 digits — raises loudly instead of
  * returning anything (Spark decimal overflow yields NULL with ANSI
  * off; every sum and product here is wrapped so that an
  * operands-present-but-result-NULL state, which can only mean
  * overflow, becomes raise_error). */
object Trend {

  private val Dec = DecimalType(38, 0)

  private def overflow(what: String): Column =
    raise_error(lit(s"Trend: $what exceeds decimal(38,0) — values past " +
      "10^38 are outside the exact-arithmetic contract"))

  /** Per-group ordinary-least-squares line y = slope·x + intercept over
    * integer (xCol, yCol) points: closed forms
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    * with EXACT decimal(38,0) moment sums (one partial-aggregated
    * shuffle on the group key — map-side combine, answer-sized output)
    * and each result a SINGLE IEEE division of exact operands —
    * bit-identical across engines, no accumulation-order sensitivity
    * anywhere. The intercept uses its own closed form rather than
    * chaining through the slope, so it too is one exact-operand
    * division. Any long x/y is in contract: x² and x·y are exact for
    * all int64 (< 8.6·10³⁷ — always inside 38 digits), and a group
    * whose SUMS or closed-form products exceed 38 digits raises
    * instead of wrapping (the sums' non-overflowable count columns are
    * the presence markers that tell overflow-NULL from all-NULL-input).
    * DuckDB mirrors with HUGEINT sums, so the double casts see the
    * same exact integers on both engines.
    * Returns (group, n_pts, slope, intercept); single-x groups (den 0)
    * and all-NULL groups return NULL slope/intercept. */
  def linearTrend(points: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long").cast(Dec)
    val y = col(yCol).cast("long").cast(Dec)
    val agg = points.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      count(x).as("nx"), count(y).as("ny"), count(x * y).as("nxy"),
      sum(x).as("sx0"), sum(y).as("sy0"),
      sum(x * x).as("sxx0"), sum(x * y).as("sxy0"))
    // a sum is NULL either because no non-NULL inputs existed (the
    // count marker is 0 — legitimate) or because it overflowed — loud
    def ckSum(s: String, marker: String, what: String): Column =
      when(col(marker) > 0 && col(s).isNull, overflow(s"Σ$what")).otherwise(col(s))
    val sx = ckSum("sx0", "nx", "x")
    val sy = ckSum("sy0", "ny", "y")
    val sxx = ckSum("sxx0", "nx", "x²")
    val sxy = ckSum("sxy0", "nxy", "x·y")
    val nD = col("n").cast(Dec)
    // a closed-form product/difference of present operands that comes
    // back NULL can only be decimal overflow — loud
    def ckExpr(e: Column, operandsPresent: Column, what: String): Column =
      when(operandsPresent && e.isNull, overflow(what)).otherwise(e)
    val haveXY = sx.isNotNull && sy.isNotNull && sxx.isNotNull && sxy.isNotNull
    val den = ckExpr(nD * sxx - sx * sx, sx.isNotNull && sxx.isNotNull,
      "n·Σx² − (Σx)²")
    val num = ckExpr(nD * sxy - sx * sy, haveXY, "n·Σxy − Σx·Σy")
    val numI = ckExpr(sy * sxx - sx * sxy, haveXY, "Σy·Σx² − Σx·Σxy")
    agg.select(col(groupCol), col("n").as("n_pts"),
      when(den =!= lit(0).cast(Dec),
        num.cast("double") / den.cast("double")).as("slope"),
      when(den =!= lit(0).cast(Dec),
        numI.cast("double") / den.cast("double")).as("intercept"))
  }

  /** Trailing-window anomaly screen over an integer series, ENTIRELY in
    * exact integer (decimal) arithmetic — no float ever exists, so the
    * flags are engine-portable by construction (stronger than the
    * double-division protocol). Per group, each point's trailing window
    * (RANGE BETWEEN `window`−1 PRECEDING AND CURRENT ROW over the
    * integer x — time-based, correct across missing points, the q68
    * convention) yields count w, sum S, sum-of-squares Q; the z-score
    * test
    *   |x − μ| > z·σ,  μ = S/w,  σ² = (w·Q − S²)/w²
    * multiplies through by w² to the integer inequality
    *   (w·y − S)² > z²·(w·Q − S²).
    * `z2` = z² (default 4 = two sigmas). Both sides are exact
    * decimal(38,0): micro-unit amounts are in contract up to
    * |w·y − S| < 10¹⁹ (per-point values around 10¹⁸/w — nine orders
    * past the old long-moment wrap at ~3·10⁹·w), and past that the
    * squares raise instead of flipping flags. DuckDB's HUGEINT window
    * sums are the exact mirror. A single-point window has σ² = 0 and
    * (y·1 − y)² = 0 — never flagged, no division-by-zero branch
    * needed. One shuffle on the group key; output is series-sized. */
  def anomalyFlags(series: DataFrame, groupCol: String, xCol: String,
      yCol: String, window: Int, z2: Int = 4): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(xCol).cast("long"))
      .rangeBetween(-(window - 1).toLong, 0L)
    val yd = col(yCol).cast("long").cast(Dec)
    val base = series.select(col(groupCol), col(xCol),
        col(yCol).cast("long").as(yCol))
      .withColumn("__w", count(lit(1)).over(w))
      .withColumn("__ny", count(col(yCol)).over(w))
      .withColumn("__s", sum(yd).over(w))
      .withColumn("__q", sum(yd * yd).over(w))
    def ckSum(s: String, what: String): Column =
      when(col("__ny") > 0 && col(s).isNull, overflow(what)).otherwise(col(s))
    val sS = ckSum("__s", "window ΣY")
    val sQ = ckSum("__q", "window ΣY²")
    def ckExpr(e: Column, operandsPresent: Column, what: String): Column =
      when(operandsPresent && e.isNull, overflow(what)).otherwise(e)
    val d = col("__w").cast(Dec) * yd - sS
    val lhs = ckExpr(d * d, d.isNotNull, "(w·y − S)²")
    val rhs = ckExpr(lit(z2).cast(Dec) * (col("__w").cast(Dec) * sQ - sS * sS),
      sS.isNotNull && sQ.isNotNull, "z²·(w·Q − S²)")
    base.select(col(groupCol), col(xCol), col(yCol), col("__w").as("n_win"),
      (lhs > rhs).as("flag"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group time-series diagnostics, completing the family around q120
  * (least-squares trend) and q121 (windowed anomaly flags):
  *
  *   - [[acf]]: autocorrelation at lags 1..K — the seasonality /
  *     persistence diagnostic (is yesterday predictive of today? is
  *     there a weekly echo?). Box–Jenkins model identification reads
  *     exactly this table.
  *   - [[cusum]]: CUSUM change-point location (Page, Biometrika 1954) —
  *     WHERE did the level shift? q121 flags local window outliers; the
  *     CUSUM statistic S_t = Σ_{i≤t}(y_i − ȳ) accumulates small
  *     persistent drifts a windowed z-test never trips on, and its
  *     |S|-argmax is the classic change-point estimate.
  *
  * Exactness protocol (§5, the q82/q120 discipline): every moment is an
  * exact DECIMAL sum with the asymmetric (19,0)×(18,0) cast trick (the
  * product stays exact in BOTH engines — see q82's comment), CUSUM is
  * pure integer arithmetic multiplied through by n (S'_t = n·P_t −
  * t·Σy — no division anywhere, so the argmax compares exact decimals),
  * and ACF surfaces floor(r_k·1e6) — one double chain over exact
  * operands with the micro-unit floor absorbing decimal→double cast
  * drift. Per-group windows sort one group's observations (bounded by
  * series length — the q103 contract; a series is days/hours, never
  * corpus-sized).
  *
  * Lag semantics: lag k is k OBSERVATIONS back in `tCol` order — the
  * caller supplies a regular (gap-free) series; compose with the q105
  * gapfill pass when the grid has holes.
  */
object TimeSeries {

  private def d(c: Column) = c.cast("double")

  /** Autocorrelation of `yCol` (integral) at lags 1..maxLag within each
    * group: (grp, k, n, acf_u) where acf_u = floor(1e6 · r_k) and r_k is
    * the Pearson correlation of (y_t, y_{t+k}) pairs. */
  def acf(series: DataFrame, grpCol: String, tCol: String, yCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32, s"maxLag must be in [1,32], got $maxLag")
    val w = Window.partitionBy(col(grpCol)).orderBy(col(tCol))
    val lagged = series.select(
      Seq(col(grpCol),
        col(yCol).cast("decimal(19,0)").as("xa"),
        col(yCol).cast("decimal(18,0)").as("xb")) ++
      (1 to maxLag).map(k =>
        lead(col(yCol), k).over(w).as(s"y$k")): _*)
    val pairs = lagged.select(col(grpCol), col("xa"), col("xb"),
      explode(array((1 to maxLag).map(k =>
        struct(lit(k).as("k"),
          col(s"y$k").cast("decimal(19,0)").as("ya"),
          col(s"y$k").cast("decimal(18,0)").as("yb"))): _*)).as("p"))
      .select(col(grpCol), col("p.k").as("k"),
        col("xa"), col("xb"), col("p.ya").as("ya"), col("p.yb").as("yb"))
      .filter(col("ya").isNotNull)
    pairs.groupBy(col(grpCol), col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).as("sx"), sum(col("ya")).as("sy"),
        sum(col("xa") * col("xb")).as("sxx"),
        sum(col("ya") * col("yb")).as("syy"),
        sum(col("xa") * col("yb")).as("sxy"))
      // correlation is undefined on a degenerate margin (one pair, or a
      // constant series): drop the row rather than surface NaN — the
      // double comparison is exact-operand, portable
      .filter(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")) > 0 &&
        d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")) > 0)
      .select(col(grpCol), col("k"), col("n"),
        floor(((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
           sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))) * 1e6)
          .cast("long").as("acf_u"))
  }

  /** CUSUM change-point per group: (grp, n_obs, t_star, s_star, s_abs)
    * where S'_t = n·P_t − t_idx·Σy (the mean-centered cumulative sum
    * multiplied through by n — exact decimal, no division), t_star is
    * the `tCol` value maximizing |S'_t| (earliest t on ties), s_star its
    * signed value. S' ≡ 0 (constant series) returns the first t. */
  def cusum(series: DataFrame, grpCol: String, tCol: String, yCol: String): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col(tCol))
    val tot = series.groupBy(col(grpCol))
      .agg(count(lit(1)).cast("decimal(18,0)").as("nn"),
        sum(col(yCol).cast("decimal(18,0)")).as("tt"))
    val scored = series
      .select(col(grpCol), col(tCol),
        sum(col(yCol).cast("decimal(19,0)")).over(w).as("p"),
        row_number().over(w).cast("decimal(19,0)").as("idx"))
      .join(tot, grpCol)
      .select(col(grpCol), col(tCol), col("idx"),
        (col("p") * col("nn") - col("idx") * col("tt"))
          .cast("decimal(38,0)").as("s"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(grpCol)).orderBy(abs(col("s")).desc, col(tCol))))
      .filter(col("rn") === 1)
      .join(tot, grpCol)
      .select(col(grpCol), col("nn").cast("long").as("n_obs"),
        col(tCol).as("t_star"), col("s").as("s_star"),
        abs(col("s")).as("s_abs"))
  }

  /** One-pass diagnostics composition (q177): a real monitoring job
    * asks all four series questions together — trend (q120 OLS),
    * anomaly screen (q121 trailing window), persistence (q161 lag-1
    * ACF), and change-point (q162 CUSUM) — yet each query alone
    * rebuilds the daily spine. Here the spine materializes ONCE (eager
    * localCheckpoint — it is groups × days, answer-sized by the q103
    * contract) and the four diagnostics read the materialized table;
    * the per-group headline row assembles by group-key joins of four
    * answer-sized results (Catalyst broadcasts them all).
    *
    * Surface per group: (grp, n_pts, slope, intercept, n_flags,
    * acf1_u, t_star, s_star) — each column under its parent operator's
    * exactness protocol; the CUSUM statistic string-surfaced per the
    * §5 wide-decimal rule. A degenerate ACF margin (constant series)
    * carries NULL acf1_u via the left join rather than dropping the
    * group's whole row. */
  def diagnose(series: DataFrame, grpCol: String, tCol: String, yCol: String,
      anomWindow: Int = 7): DataFrame = {
    val spine = series.select(col(grpCol), col(tCol), col(yCol))
      .localCheckpoint(true)
    val trend = Trend.linearTrend(spine, grpCol, tCol, yCol)
    val anom = Trend.anomalyFlags(spine, grpCol, tCol, yCol, anomWindow)
      .groupBy(col(grpCol))
      .agg(sum(when(col("flag"), 1L).otherwise(0L)).as("n_flags"))
    val acf1 = acf(spine, grpCol, tCol, yCol, maxLag = 1)
      .select(col(grpCol), col("acf_u").as("acf1_u"))
    val cus = cusum(spine, grpCol, tCol, yCol)
      .select(col(grpCol), col("t_star"),
        col("s_star").cast("string").as("s_star"))
    trend
      .join(anom, Seq(grpCol), "left")
      .join(acf1, Seq(grpCol), "left")
      .join(cus, Seq(grpCol), "left")
  }
}

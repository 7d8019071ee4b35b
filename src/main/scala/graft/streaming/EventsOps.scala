package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table. Written against the same
  * declarative surface Structured Streaming consumes: `windowedAgg` uses
  * `window()` (watermark-compatible — the streaming variant in
  * EventsStream.scala applies the identical transform to a readStream), and
  * `sessionize` isolates its single shuffle on user_id.
  */
object EventsOps {

  /** Tumbling-window aggregation: events per (window, event_type) with an
    * exact decimal sum of `value`. One shuffle on (window, event_type). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSec`. Single shuffle by
    * user_id (both window functions share the partitioning); microsecond-
    * exact integer arithmetic so results are engine-portable. */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(byUser)
    val newSession: Column = when(
      prev.isNull || (unix_micros(col("ts")) - unix_micros(prev)) > gapSec * 1000000L, 1
    ).otherwise(0)
    events
      .withColumn("__new_s", newSession)
      .withColumn("session_id", sum(col("__new_s")).over(cum))
      .drop("__new_s")
  }

  /** Per-user session stats on top of [[sessionize]]. */
  def sessionStats(events: DataFrame, gapSec: Long = 1800): DataFrame =
    sessionize(events, gapSec)
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** Markov transition matrix of the per-user event sequence (q164's
    * operator form): consecutive (type → next type) pairs within each
    * user's (ts, event_id)-ordered stream; p_u = n_ab·1e6 div n_a, an
    * EXACT truncating integer division. One map-side-combined pair
    * shuffle; per-user lead() windows bounded by one user's activity. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    pairs.groupBy(col("src")).agg(sum(col("n")).as("n_src"))
      .join(pairs, "src")
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        expr("(n * 1000000L) div n_src").as("p_u"))
  }

  /** Burst-collapse debounce — telemetry cleaning: within each
    * (user_id, event_type) stream, events separated from their
    * predecessor by ≤ `epsSec` belong to one BURST (retry storms,
    * double-clicks, duplicate beacons); only the burst's first event is
    * kept. Burst = the [[sessionize]] islands construction keyed by
    * (user, type) — "drop an event within eps of any prior event in the
    * chain", the rsyslog/metric-dedup semantics (NOT "eps since last
    * KEPT", which is inherently sequential and resample-unstable).
    * Returns events + (burst_id, kept); one shuffle, per-key windows
    * bounded by one user's activity (the q26 contract); microsecond-
    * exact integer gaps (engine-portable). */
  def debounce(events: DataFrame, epsSec: Long): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(byKey)
    val newBurst = when(
      prev.isNull || (unix_micros(col("ts")) - unix_micros(prev)) > epsSec * 1000000L, 1
    ).otherwise(0)
    events
      .withColumn("__nb", newBurst)
      .withColumn("burst_id",
        sum(col("__nb")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kept", col("__nb") === 1)
      .drop("__nb")
  }

  /** Retention-cohort matrix (q178's operator form) — the product
    * analytics every events table eventually answers: users cohorted by
    * their FIRST active period, counted again at each later period
    * offset. `periodDays` buckets the day index (7 = weekly cohorts).
    *
    * Shape: TWO shuffles total and NO self-join — per user, one
    * map-side-combined collect_set of active periods (bounded by the
    * TIMELINE length, not the corpus: a user has at most
    * days-since-launch/periodDays distinct periods — a calendar bound,
    * the strongest kind), cohort = array_min, then one explode →
    * (cohort, offset) count. The textbook first-activity-join shape
    * (distinct user-periods ⋈ per-user min) would shuffle the user-
    * period table twice more for the same answer. Surfaces raw exact
    * counts (n_users per cell); retention RATES are one division the
    * caller owns (§5 — the cell over the offset-0 cell of its row). */
  def retentionCohorts(events: DataFrame, epoch: String = "2024-01-01",
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    // FLOOR division, not cast-truncation: truncate rounds toward zero, so
    // an event BEFORE the caller-supplied epoch (day index −3, weekly) would
    // bucket to period 0 instead of −1 — diverging from the oracle's `//`
    // and silently merging pre-epoch activity into the first cohort. floor
    // over double division is exact here (day indices ≪ 2^53).
    val period = floor(datediff(to_date(col("ts")), lit(epoch).cast("date"))
      .cast("double") / periodDays).cast("long")
    events
      .select(col("user_id"), period.as("w"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("w")).as("ws"))
      .select(array_min(col("ws")).as("cohort"), explode(col("ws")).as("w"))
      .groupBy(col("cohort"), (col("w") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
final case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)
final case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)

/** Structured Streaming versions of the events operators. The windowed
  * aggregation is the *same* declarative transform as EventsOps.windowedAgg
  * applied to a readStream (watermark added); sessionization keeps bounded
  * per-user state via mapGroupsWithState — no global sort, state size
  * O(active users), exactly what survives a 100 TB/day event firehose.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a directory of event parquet/json drops. */
  def readEventStream(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Watermarked tumbling-window counts per event_type (append-able sink). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Stateful gap-based sessionization: per-user state carries the last
    * event time and running counters; a gap > gapSec opens a new session.
    * State stays O(active users). In production add
    * GroupStateTimeout.ProcessingTimeTimeout + setTimeoutDuration to evict
    * idle users; NoTimeout here keeps micro-batches data-driven (a timeout
    * makes the engine fire continuous empty batches, which is checkpoint
    * churn in a test/demo context).
    *
    * LATE-DATA SEMANTICS (explicit, because state keeps only max event
    * time): intra-batch disorder is handled (each micro-batch sorts by
    * event time); the result equals batch `EventsOps.sessionize` whenever
    * each user's events arrive across micro-batches in non-decreasing
    * event-time order. A cross-batch late event (ts < state.lastTs) is
    * absorbed into the user's current session: `n_events` still always
    * matches batch; `n_sessions` can only OVERCOUNT, and only when the late
    * event would have bridged two gap-separated sessions that streaming
    * already split. For exact results under bounded lateness L, buffer each
    * user's events in state and fold them only once the event-time
    * watermark passes their ts + L (flatMapGroupsWithState +
    * EventTimeTimeout) — that buys exactness at O(events within L) state;
    * this implementation deliberately keeps O(1) state per user. */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      gapSec: Long = 1800): Dataset[SessionAgg] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            val newSession = st.lastTs == Long.MinValue || (t - st.lastTs) > gapSec * 1000L
            st = SessionState(math.max(st.lastTs, t),
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          SessionAgg(userId, st.nSessions, st.nEvents)
      }
  }

  /** Wire a streaming DataFrame to an in-memory sink (testing/debug). */
  def toMemorySink(df: DataFrame, name: String, outputMode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
final case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)
final case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
/** [[EventsStream.sessionizeStreamExact]] state: counters are final for
  * events at/under `frontierMs` (the watermark when last folded); younger
  * events wait in `bufferMs` until the watermark passes them. */
final case class ExactSessionState(frontierMs: Long, lastTs: Long,
    nSessions: Long, nEvents: Long, bufferMs: Seq[Long])

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

  /** Watermark-buffered sessionization, EXACT under bounded lateness —
    * the upgrade path [[sessionizeStream]]'s doc promises. Per-user state
    * holds finalized counters for events the watermark has passed plus a
    * buffer of younger event times; each micro-batch folds newly-ripe
    * buffered events in event-time order, so cross-batch disorder within
    * the watermark delay sessionizes exactly like batch
    * `EventsOps.sessionize`. Emitted aggregates also fold the still-pending
    * buffer provisionally, so once all data is ingested the output equals
    * the batch answer even before the watermark catches up. State is
    * O(events within the lateness horizon) per user — the price of
    * exactness; events arriving beyond the horizon (ts ≤ frontier) are
    * absorbed into the counters without re-splitting, matching the O(1)
    * variant's behavior. NoTimeout for the same churn reason as above —
    * [[sessionizeStreamEvicting]] is the production variant that adds
    * EventTimeTimeout to evict and finalize idle users. */
  def sessionizeStreamExact(spark: SparkSession, events: Dataset[Event],
      gapSec: Long = 1800, watermarkDelay: String = "1 hour"): Dataset[SessionAgg] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[ExactSessionState, SessionAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ExactSessionState]) =>
          val (next, agg) = advanceExact(userId, batch.map(_.ts.getTime).toSeq,
            state.getOption, state.getCurrentWatermarkMs(), gapMs)
          state.update(next)
          agg
      }
  }

  /** One micro-batch step of the exact sessionizer: absorb beyond-horizon
    * events, fold newly-ripe buffered events in event-time order, carry the
    * rest, and compute the provisional aggregate (finalized counters + a
    * provisional fold of the still-pending buffer). Shared by
    * [[sessionizeStreamExact]] and [[sessionizeStreamEvicting]]. */
  private def advanceExact(userId: Long, batchTs: Seq[Long],
      prev: Option[ExactSessionState], wm: Long,
      gapMs: Long): (ExactSessionState, SessionAgg) = {
    val st = prev.getOrElse(ExactSessionState(Long.MinValue, Long.MinValue, 0L, 0L, Nil))
    val (tooLate, ok) = batchTs
      .partition(t => st.frontierMs != Long.MinValue && t <= st.frontierMs)
    val (ripe, pending) = (st.bufferMs ++ ok).sorted.partition(_ <= wm)
    var (lastTs, nSessions) = (st.lastTs, st.nSessions)
    var nEvents = st.nEvents + tooLate.size
    ripe.foreach { t =>
      if (lastTs == Long.MinValue || t - lastTs > gapMs) nSessions += 1
      nEvents += 1
      lastTs = math.max(lastTs, t)
    }
    // provisional fold of the pending buffer for the emitted row
    var (pl, ps, pe) = (lastTs, nSessions, nEvents)
    pending.foreach { t =>
      if (pl == Long.MinValue || t - pl > gapMs) ps += 1
      pe += 1
      pl = math.max(pl, t)
    }
    (ExactSessionState(wm, lastTs, nSessions, nEvents, pending),
      SessionAgg(userId, ps, pe))
  }

  /** [[sessionizeStreamExact]] plus the production evict-and-finalize path:
    * EventTimeTimeout fires once the event-time watermark passes a user's
    * last event + `idleEvictSec`; the timeout callback folds whatever is
    * still buffered (all of it is ripe by then — the timeout timestamp is
    * past every buffered event), emits the user's FINAL aggregate, and
    * REMOVES the state. Total state is therefore bounded by users active
    * within the eviction horizon, not by all users ever seen — the
    * difference between a sessionizer that survives a year of firehose and
    * one that doesn't. An event arriving after eviction starts a fresh
    * state (counted as a new user epoch), the same trade every
    * watermark-evicting engine makes. EventTimeTimeout only fires on
    * watermark advance (data-driven), so it has none of
    * ProcessingTimeTimeout's empty-batch churn. */
  def sessionizeStreamEvicting(spark: SparkSession, events: Dataset[Event],
      gapSec: Long = 1800, watermarkDelay: String = "1 hour",
      idleEvictSec: Long = 7200): Dataset[SessionAgg] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ExactSessionState, SessionAgg](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ExactSessionState]) =>
          if (state.hasTimedOut) {
            // finalize: every buffered event is older than the fired
            // timeout, hence ripe — fold in order, emit, drop the state
            val st = state.get
            var (l, s, e) = (st.lastTs, st.nSessions, st.nEvents)
            st.bufferMs.sorted.foreach { t =>
              if (l == Long.MinValue || t - l > gapMs) s += 1
              e += 1
              l = math.max(l, t)
            }
            state.remove()
            Iterator.single(SessionAgg(userId, s, e))
          } else {
            val wm = state.getCurrentWatermarkMs()
            val (next, agg) = advanceExact(userId, batch.map(_.ts.getTime).toSeq,
              state.getOption, wm, gapMs)
            state.update(next)
            // idle horizon from the newest event this user has shown us;
            // clamp above the watermark (Spark rejects timeouts ≤ wm)
            val maxSeen = (next.lastTs +: next.bufferMs).max
            state.setTimeoutTimestamp(
              math.max(maxSeen + idleEvictSec * 1000L, wm + 1L))
            Iterator.single(agg)
          }
      }
  }

  /** Watermarked stream-stream interval join: every left row pairs with
    * the right rows sharing its key whose timestamp falls in
    * [leftTs, leftTs + horizon] — clicks × purchases-within-the-hour, ad
    * impressions × conversions, etc., with BOTH sides unbounded.
    *
    * The batch analog is [[graft.ops.IntervalJoin]]; streaming gets exact
    * results with bounded state because the two watermarks plus the
    * time-range predicate tell the engine how long a buffered row can
    * still find partners: left rows age out `horizon` past the right
    * watermark, right rows age out at the left watermark — state is
    * O(rows inside the lateness+horizon window), never the full history.
    * Spark requires the range predicate for exactly this reason; an
    * unconstrained stream-stream join would buffer forever.
    *
    * `leftKey`/`rightKey` (and the two ts columns) must be distinct names
    * on the two sides — streaming joins resolve the condition by name.
    * Inner joins emit in append mode as soon as both rows arrive; pass
    * "leftOuter" to also emit unmatched left rows once the watermark
    * proves no partner can appear. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      horizon: String = "1 hour", watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"$leftKey = $rightKey AND $rightTs >= $leftTs AND $rightTs <= $leftTs + INTERVAL $horizon"),
      joinType)
  }

  /** Wire a streaming DataFrame to an in-memory sink (testing/debug). */
  def toMemorySink(df: DataFrame, name: String, outputMode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()

  /** Replay the events table as a genuine file-source stream (readStream
    * over the same parquet, schema from a batch read) — the oracle-protocol
    * bridge: a batch-SQL-checkable query can run its input through the
    * streaming engine and compare against the batch answer (q84). Same
    * TIMESTAMP(NANOS)→micros handling as [[graft.sources.Tables.load]]. */
  def replayEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Tables.path(dir, "events")
    val schema = spark.read.parquet(path).schema
    // the file source wants a DIRECTORY: point it at the parent with a
    // glob filter when the dataset is a single parquet file
    val p = new org.apache.hadoop.fs.Path(path)
    val isDir = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
    val reader = spark.readStream.schema(schema)
    val df =
      if (isDir) reader.parquet(path)
      else reader.option("pathGlobFilter", p.getName).parquet(p.getParent.toString)
    schema.find(_.name == "ts").map(_.dataType.typeName) match {
      case Some("long") => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP_NTZ parquet (regenerated testdata): watermarks demand the
      // session-TZ TIMESTAMP type — value-preserving cast under UTC, the
      // Tables.load convention
      case Some("timestamp_ntz") => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** A micro-batch arrives inside foreachBatch with its FILE
    * parallelism — often one file, one task — while the fit stages the
    * landed-artifact streams run on it (one md5 per gram/feature) are
    * cpu-heavy. Rebalance a batch below executor parallelism across
    * the cores before the fit: one batch-sized shuffle buys a
    * cores-wide map stage, and the landed partials are order-free sums
    * so the artifact is unchanged (measured on the langid fit: 68 s
    * wall ≈ cpu serial at 150k docs → 21.5 s rebalanced). A batch that
    * already carries enough partitions passes through untouched. */
  def rebalanced(batch: DataFrame): DataFrame = graft.ops.Par.balanced(batch)

  /** Materialize `df` into a fresh temp dir as `nFiles` round-robin
    * parquet files and replay it as a genuine file-source stream, ONE
    * FILE PER MICRO-BATCH — the oracle-protocol bridge for operators
    * whose result must be invariant to how the stream was batched
    * (q96's upsert table): the split is deliberately arbitrary, so a
    * batch-equivalence check over it proves order-independence, not
    * just single-batch agreement. */
  def replayShuffled(df: DataFrame, nFiles: Int): DataFrame = {
    val spark = df.sparkSession
    val dir = graft.Scratch.dir("graft_replay").toString
    df.repartition(nFiles).write.mode("overwrite").parquet(dir)
    spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
  }

  /** Replay `batches` as ORDERED micro-batches — batch i's rows all
    * arrive strictly before batch i+1's (each batch lands as one file;
    * `maxFilesPerTrigger 1` feeds the file source one file per trigger
    * in oldest-first mtime order, and the mtimes are set explicitly so
    * same-millisecond writes can't tie). This is the arrival-order
    * control the replay-vs-batch-oracle protocol needs when the
    * operator's answer depends on arrival order (first-arrival dedup,
    * in-order sessionization) — within one batch, arrival order of
    * equal-key rows is whatever the engine does, so callers arrange
    * batches such that order-sensitive collisions always span a batch
    * boundary. */
  def replayOrdered(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    val spark = batches.head.sparkSession
    val dir = graft.Scratch.dir("graft_replay2").toString
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    var seen = Set.empty[String]
    batches.zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode("append").parquet(dir)
      dataFiles.filterNot(s => seen(s.getPath.getName)).foreach { s =>
        fs.setTimes(s.getPath, 1000000L * (i + 1), -1)
        seen += s.getPath.getName
      }
    }
    spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
  }

  /** Replay `df` as two ORDERED micro-batches: all of `df` first, then
    * the single-row `sentinel` (same schema) — the watermark-flush shape
    * for windowed aggregations in append mode: real data arrives before
    * the watermark moves (nothing is dropped as late), then the
    * sentinel's far-future event time advances the watermark past every
    * real window so they all finalize and emit; the sentinel's own
    * window stays open and never emits. */
  def replayThenSentinel(df: DataFrame, sentinel: DataFrame): DataFrame =
    replayOrdered(Seq(df, sentinel))
}

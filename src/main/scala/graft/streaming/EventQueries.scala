package graft.streaming

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

object EventQueries {

  /** The batch gap-sessionization oracle — shared by q26 (the batch
    * operator) and q117 (the streaming evicting sessionizer, whose
    * batch-equivalence contract is exactly this answer). */
  private val SESSIONIZE_ORACLE_SQL = """
      WITH lagged AS (
        SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
      flagged AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM lagged),
      sess AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM sess GROUP BY user_id ORDER BY user_id"""

  /** The batch retention-cohort oracle — shared by q178 (the batch
    * scale-shape operator) and q183 (the streaming first-sight
    * extractor, whose landed rows must roll up to exactly this). */
  private val RETENTION_ORACLE_SQL = """
      WITH uw AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) // 7 AS w
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      f AS (SELECT user_id, MIN(w) AS cohort FROM uw GROUP BY 1)
      SELECT f.cohort, uw.w - f.cohort AS offset, COUNT(*) AS n_users
      FROM uw JOIN f ON f.user_id = uw.user_id
      GROUP BY 1, 2 ORDER BY 1, 2"""

  // lazy: baseDefs/transitionsDef are declared below (object-init order)
  lazy val defs: Seq[QueryDef] =
    baseDefs ++ Seq(transitionsDef, debounceDef, streamTransitionsDef,
      streamDebounceDef)

  private lazy val baseDefs: Seq[QueryDef] = Seq(

    QueryDef("q25_events_window", (s, dir) => {
      import s.implicits._
      EventsOps.windowedAgg(Tables.load(s, dir, "events"))
        .orderBy($"hour", $"event_type")
    }, Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q26_sessionize", (s, dir) => {
      EventsOps.sessionStats(Tables.load(s, dir, "events"))
    }, Some(SESSIONIZE_ORACLE_SQL)),

    // AS-OF join (graft.ops.AsofJoin — the time-series join Spark lacks):
    // each click gets the user's latest purchase at or before the click.
    // DuckDB's native ASOF JOIN is the oracle. Purchases are deduped to
    // one row per (user, ts) — max event_id wins — so the match is
    // deterministic in both engines; the matched ts surfaces as a string
    // (timestamp determinism protocol).
    QueryDef("q51_asof_join", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"ts", $"user_id")
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value")
        .withColumn("__rn", row_number().over(pw)).filter($"__rn" === 1).drop("__rn")
        .select($"user_id", $"ts", $"value".as("purchase_value"))
      graft.ops.AsofJoin.asofJoin(clicks, purchases, "user_id", "ts",
        payload = Seq("purchase_value"), prefix = "last_")
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format($"last_ts", "yyyy-MM-dd HH:mm:ss").as("last_purchase_ts"),
          $"last_purchase_value")
        .orderBy($"event_id")
    }, Some("""
      WITH clicks AS (
        SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
      purchases AS (
        SELECT user_id, ts, value AS purchase_value FROM (
          SELECT user_id, ts, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
          FROM events WHERE event_type = 'purchase')
        WHERE rn = 1)
      SELECT c.event_id, c.user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS last_purchase_ts,
             p.purchase_value AS last_purchase_value
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts <= c.ts
      ORDER BY c.event_id""")),

    // Range join (graft.ops.IntervalJoin): errors inside each user's daily
    // opening window [first event, +4h]. Bucketed equi-join on (user,
    // hour-cell) + residual containment filter — Spark's native plan for
    // the raw BETWEEN theta join is a BroadcastNestedLoopJoin, which dies
    // the moment the interval side outgrows a broadcast. The DuckDB oracle
    // IS that raw BETWEEN join (exactness), graft runs the scalable form.
    QueryDef("q52_interval_join", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val win = ev.groupBy($"user_id", to_date($"ts").as("day"))
        .agg(min($"ts").as("w_start"))
        .withColumn("w_end", expr("w_start + INTERVAL 4 HOURS"))
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"ts", $"event_id")
      graft.ops.IntervalJoin.pointInInterval(errors, win,
          "user_id", "ts", "w_start", "w_end")
        .groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_err"))
        .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"), $"n_err")
        .orderBy($"user_id", $"day")
    }, Some("""
      WITH win AS (
        SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS w_start,
               MIN(ts) + INTERVAL 4 HOUR AS w_end
        FROM events GROUP BY 1, 2),
      err AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
      SELECT w.user_id, strftime(w.day, '%Y-%m-%d') AS day,
             COUNT(*) AS n_err
      FROM err e JOIN win w
        ON e.user_id = w.user_id AND e.ts >= w.w_start AND e.ts <= w.w_end
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Funnel analysis (view → click → purchase, strictly ordered, each
    // stage within a 1-day attribution window of the previous): how far
    // each user gets, counted per stage. Formulated as three cascaded
    // conditional min-aggregations — each stage is one equi-join on
    // user_id + one partial-aggregated groupBy, all linear in |events|;
    // no per-user event sorting, no window over the raw event stream. The
    // attribution window is what real funnels use AND what keeps the
    // stage populations distinct on this corpus (unwindowed, every viewer
    // eventually purchases and the funnel collapses to one row).
    QueryDef("q75_funnel", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", $"ts")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t_view"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts" > $"t_view" && $"ts" <= $"t_view" + expr("INTERVAL 1 DAY"))
        .groupBy($"user_id").agg(min($"ts").as("t_click"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ts" > $"t_click" && $"ts" <= $"t_click" + expr("INTERVAL 1 DAY"))
        .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select((lit(1) + when($"t_click".isNotNull, 1).otherwise(0)
          + when($"t_purchase".isNotNull, 1).otherwise(0)).as("stage"))
        .groupBy($"stage").agg(count(lit(1)).as("n_users"))
        .orderBy($"stage")
    }, Some("""
      WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
              AND e.ts <= v.t_view + INTERVAL 1 DAY GROUP BY 1),
      p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
              AND e.ts <= c.t_click + INTERVAL 1 DAY GROUP BY 1)
      SELECT stage, COUNT(*) AS n_users FROM (
        SELECT 1 + CAST(c.t_click IS NOT NULL AS INTEGER)
                 + CAST(p.t_purchase IS NOT NULL AS INTEGER) AS stage
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id)
      GROUP BY stage ORDER BY stage""")),

    // Cohort retention: users grouped by first-seen day, counted per
    // active-day offset — the (cohort × offset) matrix behind retention
    // charts. One distinct, one min-agg, one equi-join on user_id; the
    // grouped output is answer-sized (days × days), never user-sized.
    QueryDef("q76_retention", (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "events")
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val cohort = d.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      d.join(cohort, "user_id")
        .groupBy($"cohort_day", datediff($"day", $"cohort_day").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select($"cohort_day".cast("string").as("cohort_day"), $"day_offset", $"n_users")
        .orderBy($"cohort_day", $"day_offset")
    }, Some("""
      WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1)
      SELECT CAST(cohort.cohort_day AS VARCHAR) AS cohort_day,
             CAST(d.day - cohort.cohort_day AS INTEGER) AS day_offset,
             COUNT(*) AS n_users
      FROM d JOIN cohort ON d.user_id = cohort.user_id
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // The stream-stream interval join under the ORACLE protocol (r7): the
    // events table is replayed through the real streaming engine (file-
    // source readStream → withWatermark → stream-stream interval join →
    // memory sink), and the result must equal DuckDB's BATCH interval
    // join on the same rows — the batch-equivalence contract Structured
    // Streaming promises for append-mode inner joins, promoted from a
    // ScalaTest (StreamingSpec) to a driver-checked CORRECTNESS row.
    // Error events pair with the same user's purchases within 2 h; the
    // answer aggregates to per-user pair counts (answer-sized output; the
    // raw pair stream is what the sink holds). processAllAvailable +
    // stop() bound the query — no open stream escapes the QueryDef.
    QueryDef("q84_stream_interval_join", (s, dir) => {
      import s.implicits._
      val ev = EventsStream.replayEvents(s, dir)
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id".as("e_user"), $"ts".as("e_ts"), $"event_id".as("e_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
      val joined = EventsStream.streamIntervalJoin(errors, purchases,
        "e_user", "p_user", "e_ts", "p_ts",
        horizon = "2 hours", watermark = "4 hours")
      s.catalog.dropTempView("q84_sink")
      val q = EventsStream.toMemorySink(
        joined.select($"e_user".as("user_id"), $"e_id", $"p_id"),
        "q84_sink", org.apache.spark.sql.streaming.OutputMode.Append())
      try q.processAllAvailable() finally q.stop()
      s.table("q84_sink")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"p_id").as("n_purchases"))
        .orderBy($"user_id")
    }, Some("""
      WITH err AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
      pur AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      SELECT e.user_id, COUNT(*) AS n_pairs,
             COUNT(DISTINCT p.event_id) AS n_purchases
      FROM err e JOIN pur p
        ON e.user_id = p.user_id
       AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 2 HOUR
      GROUP BY 1 ORDER BY 1""")),

    // Streaming CDC upsert, checked against a BATCH oracle (the q84
    // protocol, promoted to the keyed-update family): the orders table
    // is replayed as an update log — each order updates "the customer's
    // latest order" — through a genuine file-source readStream into
    // StreamMerge.upsertSink, deliberately split into ARBITRARY
    // micro-batches (replayShuffled round-robins rows across 4 files,
    // one file per trigger). The sink's max-ts merge makes the final
    // table a pure function of the update SET, so DuckDB's
    // latest-row-per-key over the same log must match exactly — hash
    // equality here proves batch-split invariance, not just
    // single-batch agreement. Continuous form of the reference's keyed
    // update (SQL_DATA_INTEGRATION_TOOL.py:282-312).
    QueryDef("q96_stream_upsert", (s, dir) => {
      import s.implicits._
      val log = Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_totalprice")
      val updates = EventsStream.replayShuffled(log, nFiles = 4)
      val target = graft.Scratch.dir("q96_tgt").toString + "/table"
      val ckpt = graft.Scratch.dir("q96_ck").toString
      val q = StreamMerge.upsertSink(updates, "o_custkey", "o_orderdate", target, ckpt)
      q.awaitTermination() // AvailableNow: self-terminates after the last file
      s.read.parquet(target)
        .select($"o_custkey",
          date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
          $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
             o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC, o_totalprice DESC) AS rn
        FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    // Streaming drift monitor vs a BATCH oracle: documents get synthetic
    // event times (a pure function of doc_id both engines compute),
    // replay through a watermarked windowed token count (append mode:
    // each window emits once, when the watermark closes it), then the
    // batch half ranks the landed windows top-5. The sentinel row's
    // far-future event time closes every real window (its own window
    // never emits); replayThenSentinel orders the two micro-batches so
    // no real row arrives late. The oracle recomputes windowed counts +
    // rank from scratch — hash equality proves the watermark lifecycle
    // emitted every window exactly once with exact counts.
    QueryDef("q97_trending_tokens", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text",
          expr("timestampadd(MINUTE, CAST(doc_id % 180 AS INT), " +
            "TIMESTAMP'2024-01-01 00:00:00')").as("ts"))
      val sentinel = Seq((-1L, "zz")).toDF("doc_id", "text")
        .select($"doc_id", $"text", expr("TIMESTAMP'2024-01-10 00:00:00'").as("ts"))
      val stream = EventsStream.replayThenSentinel(docs, sentinel)
      val counts = TrendingTokens.tokenCountsStream(stream, "text", "ts",
        windowLen = "30 minutes", delay = "10 minutes")
      s.catalog.dropTempView("q97_sink")
      val q = EventsStream.toMemorySink(counts, "q97_sink",
        org.apache.spark.sql.streaming.OutputMode.Append())
      try q.processAllAvailable() finally q.stop()
      TrendingTokens.topTokens(s.table("q97_sink"), k = 5)
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
          $"rk", $"tok", $"n")
        .orderBy($"win_start", $"rk")
    }, Some("""
      WITH toks AS (
        SELECT TIMESTAMP '2024-01-01 00:00:00'
                 + to_minutes(CAST((doc_id % 180) // 30 * 30 AS BIGINT)) AS w,
               unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
        FROM documents),
      cnt AS (SELECT w, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2),
      rkd AS (SELECT w, tok, n,
                ROW_NUMBER() OVER (PARTITION BY w ORDER BY n DESC, tok) AS rk
              FROM cnt)
      SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS win_start,
             CAST(rk AS INTEGER) AS rk, tok, n
      FROM rkd WHERE rk <= 5 ORDER BY win_start, rk""")),

    // Gaps-and-islands: per-user consecutive-activity-day streaks — the
    // classic day-minus-row_number grouping, entirely window+groupBy
    // declarative (both shuffles partition by user_id; streak rows are
    // answer-sized). The longest streak and its start date come from one
    // struct-max (len, then EARLIEST start via negated epoch-day) — the
    // same pick as the oracle's ROW_NUMBER() OVER (len DESC, start ASC),
    // with no second window pass.
    QueryDef("q103_islands", (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"day")
      val days = Tables.load(s, dir, "events")
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val streaks = days
        .withColumn("grp",
          datediff($"day", lit("1970-01-01").cast("date")) - row_number().over(w))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("len"), min($"day").as("start_day"))
      streaks.groupBy($"user_id")
        .agg(count(lit(1)).cast("long").as("n_streaks"),
          sum($"len").as("n_active_days"),
          max(struct($"len",
            (lit(0) - datediff($"start_day", lit("1970-01-01").cast("date"))).as("negday")))
            .as("best"))
        .select($"user_id", $"n_streaks", $"n_active_days",
          $"best.len".as("max_streak"),
          date_format(date_add(lit("1970-01-01").cast("date"),
            (lit(0) - $"best.negday").cast("int")), "yyyy-MM-dd").as("best_start"))
        .orderBy($"user_id")
    }, Some("""
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      g AS (SELECT user_id, day,
              (day - DATE '1970-01-01')
                - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
            FROM days),
      streaks AS (SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start_day
                  FROM g GROUP BY 1, 2),
      ranked AS (SELECT user_id, len, start_day,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY len DESC, start_day) AS rk
                 FROM streaks),
      summary AS (SELECT user_id, COUNT(*) AS n_streaks,
                         CAST(SUM(len) AS BIGINT) AS n_active_days
                  FROM streaks GROUP BY 1)
      SELECT s.user_id, s.n_streaks, s.n_active_days,
             r.len AS max_streak, strftime(r.start_day, '%Y-%m-%d') AS best_start
      FROM summary s JOIN ranked r ON s.user_id = r.user_id AND r.rk = 1
      ORDER BY s.user_id""")),

    // Time-series regularization: densify per-user daily activity onto
    // the corpus-wide day grid (`sequence` + explode — the generate_series
    // Spark-side), zero-fill counts, forward-fill the last observed
    // daily value sum (LOCF). The grid is users × days (answer-sized;
    // the one-row bounds aggregate broadcasts), the observed side
    // arrives via a shuffled left join on (user, day), and the fill is
    // one `last(ignoreNulls)` running window per user — no driver loop,
    // no UDF. Carried values are exact decimal sums surfaced as doubles
    // (the §5 protocol), and LOCF only copies them, so cross-engine
    // equality is preserved bit-for-bit.
    QueryDef("q105_gapfill", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val daily = ev.groupBy($"user_id", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,4)")).cast("double").as("vsum"))
      val bounds = ev.agg(min(to_date($"ts")).as("lo"), max(to_date($"ts")).as("hi"))
      val grid = ev.select($"user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select($"user_id", explode(sequence($"lo", $"hi")).as("day"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", coalesce($"n", lit(0L)).as("n_events"),
          last($"vsum", ignoreNulls = true).over(w).as("ffill_value"))
        .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
          $"n_events", $"ffill_value")
        .orderBy($"user_id", $"day")
    }, Some("""
      WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
                      FROM events),
      grid AS (SELECT u.user_id, CAST(gs.g AS DATE) AS day
               FROM (SELECT DISTINCT user_id FROM events) u, bounds,
                    LATERAL (SELECT UNNEST(generate_series(bounds.lo, bounds.hi,
                             INTERVAL 1 DAY)) AS g) gs),
      daily AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS vsum
                FROM events GROUP BY 1, 2)
      SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
             COALESCE(d.n, 0) AS n_events,
             LAST_VALUE(d.vsum IGNORE NULLS) OVER (PARTITION BY g.user_id
               ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ffill_value
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
      ORDER BY g.user_id, day""")),

    // Temporal (SCD2 as-of) join — the composition that makes q78's
    // version history USEFUL: purchases joined to the engagement tier
    // (floor of the last 'view' value) VALID AT purchase time. SCD2
    // tiles time per key (valid_to = next valid_from), so "the version
    // valid at ts" IS the as-of backward match on valid_from — the
    // single-shuffle AsofJoin formulation, no range join, no
    // BroadcastNestedLoopJoin. The oracle replays the same version
    // derivation and uses DuckDB's native ASOF LEFT JOIN.
    QueryDef("q113_temporal_join", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
      // one tier observation per (user, instant): ties collapse to the
      // max event_id so version starts are unique per key — the
      // uniqueness AsofJoin's contract asks for
      val chg = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id",
          floor($"value").cast("int").as("tier"))
        .withColumn("__rn", row_number().over(pw)).filter($"__rn" === 1).drop("__rn")
      val versions = graft.ops.Merge
        .scd2FromChangelog(chg, "user_id", "tier", "ts", "event_id")
        .select($"user_id", $"valid_from".as("ts"), $"tier")
      val purch = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      graft.ops.AsofJoin.asofJoin(purch, versions, "user_id", "ts",
        payload = Seq("tier"))
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          $"asof_tier".as("tier_at_purchase"),
          date_format($"asof_ts", "yyyy-MM-dd HH:mm:ss").as("tier_since"))
        .orderBy($"event_id")
    }, Some("""
      WITH chg0 AS (
        SELECT user_id, ts, event_id, CAST(FLOOR(value) AS INTEGER) AS tier FROM (
          SELECT user_id, ts, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
          FROM events WHERE event_type = 'view') WHERE rn = 1),
      chg AS (
        SELECT user_id, ts AS valid_from, tier FROM (
          SELECT user_id, ts, tier,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                 LAG(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM chg0) WHERE rn = 1 OR tier IS DISTINCT FROM prev),
      purch AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             c.tier AS tier_at_purchase,
             strftime(c.valid_from, '%Y-%m-%d %H:%M:%S') AS tier_since
      FROM purch p ASOF LEFT JOIN chg c
        ON p.user_id = c.user_id AND c.valid_from <= p.ts
      ORDER BY p.event_id""")),

    // Streaming ingest dedup under the ORACLE protocol (the q96/q97
    // replay-vs-batch-oracle shape, applied to the last tested-only
    // ingest component): documents arrive as an ordered two-batch
    // stream — all originals first, then planted duplicate arrivals
    // (same text behind different whitespace, later event time, ids
    // +1000000) — through dropDuplicatesWithinWatermark on the
    // normalized-text fingerprint. First-arrival semantics are only
    // well-defined ACROSS batches (within a micro-batch, equal-fp row
    // order is engine-arbitrary), so the replay puts every planted
    // collision across the batch boundary, and the corpus's natural
    // fingerprints are unique (verified at the gate sf); the oracle is
    // first-arrival-per-fingerprint by (ts, doc_id). Hash equality
    // gates the fingerprint normalization, the state carry across
    // batches, and the non-expiry of in-horizon state at once.
    QueryDef("q116_stream_dedup", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text",
          expr("timestampadd(MINUTE, CAST(doc_id % 180 AS INT), " +
            "TIMESTAMP'2024-01-01 00:00:00')").as("ts"))
      val dups = Tables.load(s, dir, "documents").filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat(lit("  "), $"text").as("text"),
          expr("timestampadd(MINUTE, CAST(doc_id % 180 AS INT), " +
            "TIMESTAMP'2024-01-01 12:00:00')").as("ts"))
      val stream = EventsStream.replayOrdered(Seq(docs, dups))
      val deduped = StreamingDedup.dedupStream(stream, "text", "ts",
        watermarkDelay = "48 hours")
      s.catalog.dropTempView("q116_sink")
      val q = EventsStream.toMemorySink(deduped.select($"doc_id", $"fp"),
        "q116_sink", org.apache.spark.sql.streaming.OutputMode.Append())
      try q.processAllAvailable() finally q.stop()
      s.table("q116_sink").orderBy($"doc_id")
    }, Some("""
      WITH src AS (
        SELECT doc_id, text,
               TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id % 180) AS ts
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000, '  ' || text,
               TIMESTAMP '2024-01-01 12:00:00' + to_minutes(doc_id % 180)
        FROM documents WHERE doc_id % 5 = 0),
      fps AS (
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp, ts
        FROM src)
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY ts, doc_id) AS rn
        FROM fps) WHERE rn = 1
      ORDER BY doc_id""")),

    // The evicting streaming sessionizer under the ORACLE protocol —
    // the streaming family's last protocol gap: events replay as THREE
    // event-time-ordered micro-batches (arrival order = event-time
    // order, so the watermark-buffered fold is a growing in-order
    // prefix and every emitted aggregate is monotone — max() over the
    // update stream IS the final answer) plus a far-future sentinel
    // that advances the watermark past every user's idle horizon: the
    // EventTimeTimeout eviction path fires for every real user,
    // finalizing and REMOVING state (the path that bounds state for a
    // year of firehose). idleEvictSec spans the corpus's one-month ts
    // range so no user evicts mid-stream (an eviction epoch split is
    // the one deliberate divergence from batch semantics; the component
    // test covers it). Oracle = the q26 batch sessionization answer —
    // the streaming engine's batch-equivalence contract.
    QueryDef("q117_stream_sessionize", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      def upTo(a: String, b: String) =
        ev.filter($"ts" >= lit(a).cast("timestamp") && $"ts" < lit(b).cast("timestamp"))
      val sentinel = Seq((-1L,
        java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), -1L, "view", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val stream = EventsStream.replayOrdered(Seq(
        upTo("1970-01-01", "2024-01-11"), upTo("2024-01-11", "2024-01-21"),
        upTo("2024-01-21", "2030-01-01"), sentinel))
      val sess = EventsStream.sessionizeStreamEvicting(s, stream.as[Event],
        gapSec = 1800, watermarkDelay = "1 hour",
        idleEvictSec = 45L * 24 * 3600)
      s.catalog.dropTempView("q117_sink")
      val q = EventsStream.toMemorySink(sess.toDF(), "q117_sink",
        org.apache.spark.sql.streaming.OutputMode.Update())
      try q.processAllAvailable() finally q.stop()
      s.table("q117_sink").filter($"user_id" >= 0)
        .groupBy($"user_id")
        .agg(max($"n_sessions").as("n_sessions"), max($"n_events").as("n_events"))
        .orderBy($"user_id")
    }, Some(SESSIONIZE_ORACLE_SQL)),

    // Windowed anomaly screen (ops/Trend.anomalyFlags): per-event-type
    // daily volumes against their own 7-day trailing window, flagged by
    // the 2σ z-test multiplied through to the INTEGER inequality
    // (w·y − S)² > 4(w·Q − S²) — no float ever exists, so the flags are
    // engine-portable by construction (stronger than the §5 decimal
    // protocol). A deterministic ×3 spike planted on day 15 keeps the
    // flag column non-degenerate at every sf. One event_type shuffle;
    // RANGE window over the day index is time-based (q68 convention).
    QueryDef("q121_anomaly", (s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(count(lit(1)).as("n0"))
        .select($"event_type", $"d",
          when($"d" === 15, $"n0" * 3).otherwise($"n0").as("n"))
      graft.ops.Trend.anomalyFlags(daily, "event_type", "d", "n", window = 7)
        .orderBy($"event_type", $"d")
    }, Some("""
      WITH daily0 AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               COUNT(*) AS n0
        FROM events GROUP BY 1, 2),
      daily AS (
        SELECT event_type, d,
               CASE WHEN d = 15 THEN n0 * 3 ELSE n0 END AS n FROM daily0),
      win AS (
        SELECT event_type, d, n,
               COUNT(*) OVER wdw AS w,
               SUM(n)   OVER wdw AS s,
               SUM(n*n) OVER wdw AS q
        FROM daily
        WINDOW wdw AS (PARTITION BY event_type ORDER BY d
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT event_type, d, n, CAST(w AS BIGINT) AS n_win,
             (w*n - s)*(w*n - s) > 4*(w*q - s*s) AS flag
      FROM win ORDER BY event_type, d""")),

    // Streaming distinct counting via the HLL sketch (ops/Sketches.scala
    // composed with Structured Streaming) — the aggregate that makes
    // "distinct users per event type, live" possible with BOUNDED state:
    // exact streaming COUNT(DISTINCT) would hold every key ever seen,
    // while the register table holds groups × 2^p rows no matter how
    // long the stream runs. Protocol: the q96 batch-split-invariance
    // replay (`replayShuffled` — deliberately ARBITRARY round-robin
    // micro-batches) through the same register aggregation
    // (`Sketches.hllRegisters` runs unchanged on a streaming frame —
    // max() is order- and batch-invariant, which is WHY the sketch
    // streams), landed complete-mode, summarized by the batch half; the
    // DuckDB oracle rebuilds registers, v_zero, s_u and the estimate
    // from the events table from scratch (the q128 construction), so
    // hash equality proves the streamed registers equal the from-scratch
    // batch sketch register-for-register regardless of the batch split.
    QueryDef("q131_stream_distinct", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_type".as("grp"), $"user_id")
      val regs = graft.ops.Sketches.hllRegisters(
        EventsStream.replayShuffled(ev, nFiles = 4), "grp", $"user_id", p = 4)
      val sink = s"q131_regs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = regs.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.ops.Sketches.hllSummary(s.table(sink), "grp", p = 4)
        .orderBy($"grp")
    }, Some("""
      WITH h AS (
        SELECT event_type AS grp,
               CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
      r0 AS (
        SELECT grp, h % 16 AS j,
               CASE WHEN h // 16 = 0 THEN 57
                    ELSE 57 - length(bin(h // 16)) END AS rank
        FROM h),
      reg AS (SELECT grp, j, MAX(rank) AS m_j FROM r0 GROUP BY 1, 2),
      spine AS (SELECT g.grp, s.j
                FROM (SELECT DISTINCT grp FROM reg) g
                CROSS JOIN (SELECT unnest(range(16)) AS j) s),
      dense AS (SELECT sp.grp, sp.j, COALESCE(r.m_j, 0) AS m_j
                FROM spine sp LEFT JOIN reg r ON sp.grp = r.grp AND sp.j = r.j),
      summ AS (SELECT grp,
                      string_agg(CAST(m_j AS VARCHAR), ',' ORDER BY j) AS regs,
                      CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS INTEGER) AS v_zero,
                      CAST(SUM((CAST(1 AS BIGINT) << 57) // (CAST(1 AS BIGINT) << m_j)) AS BIGINT) AS s_u
               FROM dense GROUP BY 1)
      SELECT grp, regs, v_zero, s_u,
             0.673 * 256.0 * 144115188075855872.0 / s_u AS est
      FROM summ ORDER BY grp""")),

    // STREAMING quantile sketch: q149's base-2 DD histogram as live
    // bounded state — the ≤ groups × 8 × bitlen bucket table IS the
    // aggregation state (complete mode), so "p99 of the stream so far"
    // never buffers raw events. The replay arrives shuffled across 4
    // files (arrival order ≠ event order — bucketing is order-free, the
    // q131 discipline), and the oracle computes the same all-integer
    // histogram + cum·1000 ≥ q·n extraction from the RAW batch table:
    // streamed buckets == batch buckets, bit for bit. Values integerize
    // to cents through the §5 decimal discipline.
    QueryDef("q150_stream_quantile", (s, dir) => {
      import s.implicits._
      // zero-valued events carry no magnitude to rank — excluded
      // EXPLICITLY in both engines (the sketch's domain is positive
      // integers and its guard would otherwise raise, by design)
      val ev = Tables.load(s, dir, "events")
        .select($"event_type".as("grp"),
          ($"value".cast("decimal(18,4)") * 100).cast("long").as("v"))
        .filter($"v" >= 1)
      val bk = graft.ops.Sketches.ddBuckets(
        EventsStream.replayShuffled(ev, nFiles = 4), "grp", $"v", sig = 4)
      val sink = s"q150_bk_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = bk.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.ops.Sketches.ddQuantiles(s.table(sink), "grp", Seq(500, 900, 990))
        .orderBy($"grp", $"q")
    }, Some("""
      WITH v AS (
        SELECT event_type AS grp,
               CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS v
        FROM events
        WHERE CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) >= 1),
      b0 AS (
        SELECT grp, v,
               CASE WHEN length(bin(v)) - 4 > 0 THEN length(bin(v)) - 4 ELSE 0 END AS sh
        FROM v),
      bk AS (
        SELECT grp, v - (v % (CAST(1 AS BIGINT) << sh)) AS lo, COUNT(*) AS cnt
        FROM b0 GROUP BY 1, 2),
      n AS (SELECT grp, SUM(cnt) AS n FROM bk GROUP BY 1),
      cum AS (SELECT grp, lo, cnt,
                     SUM(cnt) OVER (PARTITION BY grp ORDER BY lo) AS cum
              FROM bk),
      qs AS (SELECT CAST(unnest([500, 900, 990]) AS INTEGER) AS q)
      SELECT c.grp, q.q, CAST(n.n AS BIGINT) AS n, MIN(c.lo) AS est
      FROM cum c JOIN n ON n.grp = c.grp CROSS JOIN qs q
      WHERE c.cum * 1000 >= q.q * n.n
      GROUP BY 1, 2, 3
      ORDER BY c.grp, q.q""")),

    // STREAMING anomaly monitor (streaming/StreamingAnomaly.scala) under
    // the ORACLE protocol: q121's integer z-test as a live
    // flatMapGroupsWithState monitor — per-key state is the last-7-day
    // deque (bounded for any stream lifetime), each day flagged the
    // micro-batch it closes. The replay carries the same daily series as
    // q121 (day-15 ×3 spike included), pre-aggregated — the finalized
    // per-day rows an upstream watermark-closed aggregation emits — in
    // three event-time-ordered batches, so flags for days 10–19 depend
    // on cross-batch state carried from days 0–9 (the q116/q117
    // cross-batch-carry discipline). BigInt state arithmetic mirrors the
    // batch operator's decimal(38,0) contract; the oracle IS q121's SQL
    // — the batch-equivalence contract for the whole streaming state
    // machine.
    QueryDef("q139_stream_anomaly", (s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy($"event_type".as("grp"),
          datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(count(lit(1)).as("n0"))
        .select($"grp", $"d",
          when($"d" === 15, $"n0" * 3).otherwise($"n0").as("n"))
      val stream = EventsStream.replayOrdered(Seq(
        daily.filter($"d" < 10), daily.filter($"d" >= 10 && $"d" < 20),
        daily.filter($"d" >= 20)))
      val flagged = graft.streaming.StreamingAnomaly.flags(
        s, stream.as[graft.streaming.StreamingAnomaly.Point], window = 7)
      s.catalog.dropTempView("q139_sink")
      val q = EventsStream.toMemorySink(flagged.toDF(), "q139_sink",
        org.apache.spark.sql.streaming.OutputMode.Append())
      try q.processAllAvailable() finally q.stop()
      s.table("q139_sink")
        .select($"grp".as("event_type"), $"d", $"n", $"n_win", $"flag")
        .orderBy($"event_type", $"d")
    }, Some("""
      WITH daily0 AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               COUNT(*) AS n0
        FROM events GROUP BY 1, 2),
      daily AS (
        SELECT event_type, d,
               CASE WHEN d = 15 THEN n0 * 3 ELSE n0 END AS n FROM daily0),
      win AS (
        SELECT event_type, d, n,
               COUNT(*) OVER wdw AS w,
               SUM(n)   OVER wdw AS s,
               SUM(n*n) OVER wdw AS q
        FROM daily
        WINDOW wdw AS (PARTITION BY event_type ORDER BY d
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT event_type, d, n, CAST(w AS BIGINT) AS n_win,
             (w*n - s)*(w*n - s) > 4*(w*q - s*s) AS flag
      FROM win ORDER BY event_type, d""")),

    // STREAMING count-min frequency sketch: q129's depth×width counter
    // table as live bounded state — counters are SUMs, and sum is batch-
    // and order-invariant, so `Sketches.cmsCounters` runs UNCHANGED on a
    // streaming frame (the q131 register discipline applied to the
    // frequency sketch). The corpus replays shuffled across 4 arbitrary
    // micro-batches; complete-mode state is ≤ depth×width rows no matter
    // how long the stream runs, where exact streaming token counting
    // would hold every distinct token ever seen. The batch half then
    // point-estimates the top-8 true-frequency tokens against the
    // STREAMED counters, and the DuckDB oracle rebuilds every counter
    // and estimate from the raw table (q129's SQL verbatim): hash
    // equality proves streamed counters == from-scratch batch counters
    // bit-for-bit regardless of the batch split.
    QueryDef("q152_stream_freq", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val streamToks = EventsStream.replayShuffled(docs, nFiles = 4)
        .select(explode(split(graft.text.TextAnalysis.normalize($"text"), " ", -1)).as("tok"))
      val counters = graft.ops.Sketches.cmsCounters(
        streamToks, $"tok", lit(1L), depth = 4, width = 32)
      val sink = s"q152_ctr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = counters.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batchToks = docs.select(
        explode(split(graft.text.TextAnalysis.normalize($"text"), " ", -1)).as("tok"))
      val truth = batchToks.groupBy($"tok").agg(count(lit(1)).as("true_n"))
        .orderBy($"true_n".desc, $"tok").limit(8)
      val est = graft.ops.Sketches.cmsEstimate(
        s.table(sink), truth.select($"tok"), "tok", depth = 4, width = 32)
      truth.join(est, "tok").select($"tok", $"true_n", $"est_n")
        .orderBy($"tok")
    }, Some("""
      WITH toks AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
        FROM documents),
      cnt AS (SELECT tok, COUNT(*) AS true_n FROM toks GROUP BY 1),
      probes AS (SELECT tok, true_n FROM cnt ORDER BY true_n DESC, tok LIMIT 8),
      ctr AS (
        SELECT i.i AS i,
               CAST(('0x' || substr(md5('cms:' || CAST(i.i AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 32 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i) i
        GROUP BY 1, 2),
      pb AS (
        SELECT p.tok, i.i AS i,
               CAST(('0x' || substr(md5('cms:' || CAST(i.i AS VARCHAR) || ':' || p.tok), 1, 15)) AS BIGINT) % 32 AS bucket
        FROM probes p CROSS JOIN (SELECT unnest(range(4)) AS i) i),
      pe AS (SELECT pb.tok, CAST(MIN(COALESCE(ctr.c, 0)) AS BIGINT) AS est_n
             FROM pb LEFT JOIN ctr ON ctr.i = pb.i AND ctr.bucket = pb.bucket
             GROUP BY 1)
      SELECT p.tok, p.true_n, pe.est_n
      FROM probes p JOIN pe USING (tok) ORDER BY tok""")),

    // STREAMING KMV distinct sketch: the bottom-k aggregate
    // (org.apache.spark.sql.graft.BottomKLongs — q134's build kernel) as
    // live bounded state. This closes the mergeable-sketch family's
    // streaming symmetry (HLL q131, count-min q152, quantile q150, KMV
    // here): per-group state is ≤ k longs for ANY stream lifetime —
    // set-union-then-trim is associative, commutative and idempotent, so
    // the aggregate is batch-split-invariant by construction and the
    // arbitrary 4-file shuffled replay lands the SAME sketch as a batch
    // build. The batch half explodes the sink's arrays to (grp, h, r)
    // rows and attaches the q134 unbiased estimate; the oracle rebuilds
    // the bottom-k from the raw events table — hash equality proves
    // streamed sketch == from-scratch batch sketch, hash for hash.
    QueryDef("q153_stream_kmv", (s, dir) => {
      import s.implicits._
      val k = 64
      val ev = Tables.load(s, dir, "events")
        .select($"event_type".as("grp"), $"user_id")
      val sk0 = EventsStream.replayShuffled(ev, nFiles = 4)
        .groupBy($"grp")
        .agg(org.apache.spark.sql.graft.BottomKLongs(
          graft.ops.Sketches.kmvHash($"user_id"), k).as("hs"))
      val sink = s"q153_kmv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = sk0.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sk = s.table(sink)
        .select($"grp", posexplode($"hs").as(Seq("p", "h")))
        .select($"grp", $"h", ($"p" + 1).cast("int").as("r"))
      // estimate via windows over the SAME frame — a kmvEstimate self-join
      // trips attribute-conflict resolution on streaming memory sinks
      // (the q149/ddQuantiles discipline); sketch-sized work either way
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"grp")
      sk.withColumn("__sz", count(lit(1)).over(wAll))
        .withColumn("__hk", max($"h").over(wAll))
        .select($"grp", $"r", $"h",
          when($"__sz" < k, $"__sz".cast("double"))
            .otherwise(lit((k - 1).toDouble * graft.ops.Sketches.KmvM) / $"__hk")
            .as("est"))
        .orderBy($"grp", $"r")
    }, Some("""
      WITH h AS (
        SELECT DISTINCT event_type AS grp,
               CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
      rk AS (SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r FROM h),
      sk AS (SELECT grp, h, CAST(r AS INTEGER) AS r FROM rk WHERE r <= 64),
      est AS (
        SELECT grp,
               CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE 63.0 * 1152921504606846976.0 / MAX(h) END AS est
        FROM sk GROUP BY 1)
      SELECT s.grp, s.r, s.h, e.est
      FROM sk s JOIN est e USING (grp)
      ORDER BY s.grp, s.r""")),

    // Autocorrelation diagnostics (ops/TimeSeries.acf — Box–Jenkins
    // model identification): per event type, is yesterday's volume
    // predictive of today's, and is there a multi-day echo? Lags 1..3
    // over the daily count series (the q121 spine); moments are exact
    // decimals (the q82 asymmetric-cast discipline), the surfaced value
    // is floor(r_k·1e6) — one double chain over exact operands.
    QueryDef("q161_acf", (s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(count(lit(1)).as("n"))
      graft.ops.TimeSeries.acf(daily, "event_type", "d", "n", maxLag = 3)
        .orderBy($"event_type", $"k")
    }, Some("""
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, d,
               CAST(n AS DECIMAL(19,0)) AS xa, CAST(n AS DECIMAL(18,0)) AS xb,
               LEAD(n, 1) OVER wdw AS y1,
               LEAD(n, 2) OVER wdw AS y2,
               LEAD(n, 3) OVER wdw AS y3
        FROM daily
        WINDOW wdw AS (PARTITION BY event_type ORDER BY d)),
      pairs AS (
        SELECT event_type, p.k AS k, xa, xb,
               CAST(p.y AS DECIMAL(19,0)) AS ya, CAST(p.y AS DECIMAL(18,0)) AS yb
        FROM (SELECT event_type, xa, xb,
                     unnest([{'k': 1, 'y': y1}, {'k': 2, 'y': y2}, {'k': 3, 'y': y3}]) AS p
              FROM lagged)
        WHERE p.y IS NOT NULL),
      mo AS (
        SELECT event_type, k, COUNT(*) AS n,
               SUM(xa) AS sx, SUM(ya) AS sy,
               SUM(xa * xb) AS sxx, SUM(ya * yb) AS syy, SUM(xa * yb) AS sxy
        FROM pairs GROUP BY 1, 2
        HAVING CAST(COUNT(*) AS DOUBLE) * CAST(SUM(xa * xb) AS DOUBLE)
                 - CAST(SUM(xa) AS DOUBLE) * CAST(SUM(xa) AS DOUBLE) > 0
           AND CAST(COUNT(*) AS DOUBLE) * CAST(SUM(ya * yb) AS DOUBLE)
                 - CAST(SUM(ya) AS DOUBLE) * CAST(SUM(ya) AS DOUBLE) > 0)
      SELECT event_type, k, n,
             CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1e6) AS BIGINT) AS acf_u
      FROM mo ORDER BY event_type, k""")),

    // CUSUM change-point location (ops/TimeSeries.cusum — Page 1954):
    // WHERE did the level shift? q121 flags local window outliers; the
    // cumulative mean-centered sum accumulates persistent drifts a
    // windowed z-test never trips, and its |S|-argmax is the classic
    // change-point estimate. Planted specimen: 'click' gains +40/day
    // from day 16 on — the argmax lands at the shift boundary (±1 day
    // of daily noise; |S| = 9180 at sf0.01 vs ≤ 1075 on every unshifted
    // type, an order of magnitude of separation). S' is pure integer
    // arithmetic multiplied through by n (no division, no float
    // anywhere); the exact boundary semantics are pinned by the
    // TimeSeries unit test on a noise-free series.
    QueryDef("q162_cusum", (s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(count(lit(1)).as("n0"))
        .select($"event_type", $"d",
          when($"event_type" === "click" && $"d" >= 16, $"n0" + 40)
            .otherwise($"n0").as("n"))
      // §5 surface rule (r12): the CUSUM statistic is decimal(38,0)
      // internally (n·P_t − t·Σy genuinely outgrows long at corpus
      // scale) but SURFACES as a string — wide decimals in a final
      // output trip the driver's cross-engine hash canonicalization.
      graft.ops.TimeSeries.cusum(daily, "event_type", "d", "n")
        .select($"event_type", $"n_obs", $"t_star",
          $"s_star".cast("string").as("s_star"),
          $"s_abs".cast("string").as("s_abs"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily0 AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               COUNT(*) AS n0
        FROM events GROUP BY 1, 2),
      daily AS (
        SELECT event_type, d,
               CASE WHEN event_type = 'click' AND d >= 16 THEN n0 + 40 ELSE n0 END AS n
        FROM daily0),
      tot AS (
        SELECT event_type, CAST(COUNT(*) AS DECIMAL(18,0)) AS nn,
               CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DECIMAL(28,0)) AS tt
        FROM daily GROUP BY 1),
      pre AS (
        SELECT event_type, d,
               SUM(CAST(n AS DECIMAL(19,0))) OVER wdw AS p,
               CAST(ROW_NUMBER() OVER wdw AS DECIMAL(19,0)) AS idx
        FROM daily
        WINDOW wdw AS (PARTITION BY event_type ORDER BY d)),
      sc AS (
        SELECT pre.event_type, pre.d, pre.idx,
               CAST(pre.p * t.nn - pre.idx * t.tt AS DECIMAL(38,0)) AS s
        FROM pre JOIN tot t ON t.event_type = pre.event_type),
      top AS (
        SELECT event_type, d, s,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(s) DESC, d) AS rn
        FROM sc)
      SELECT top.event_type, CAST(t.nn AS BIGINT) AS n_obs, top.d AS t_star,
             CAST(top.s AS VARCHAR) AS s_star, CAST(abs(top.s) AS VARCHAR) AS s_abs
      FROM top JOIN tot t ON t.event_type = top.event_type
      WHERE rn = 1 ORDER BY top.event_type""")),

    // Time-series diagnostics composition (TimeSeries.diagnose): the
    // monitoring pass a pipeline actually runs — trend (q120), anomaly
    // screen (q121), lag-1 ACF (q161), and CUSUM change-point (q162)
    // over ONE materialized daily spine instead of four rebuilds; the
    // headline table is one row per event type. Both planted specimens
    // ride the shared spine (day-15 ×3 spike → n_flags non-degenerate;
    // click +40/day from day 16 → the CUSUM argmax lands at the
    // boundary), so every diagnostic column carries signal at every sf.
    // Each column keeps its parent operator's exactness protocol; the
    // CUSUM statistic is string-surfaced (§5 wide-decimal rule).
    QueryDef("q177_ts_diagnose", (s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(count(lit(1)).as("n0"))
        .select($"event_type", $"d",
          (when($"d" === 15, $"n0" * 3).otherwise($"n0") +
            when($"event_type" === "click" && $"d" >= 16, 40L).otherwise(0L))
            .as("n"))
      graft.ops.TimeSeries.diagnose(daily, "event_type", "d", "n",
          anomWindow = 7)
        .orderBy($"event_type")
    }, Some("""
      WITH daily0 AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               COUNT(*) AS n0
        FROM events GROUP BY 1, 2),
      daily AS (
        SELECT event_type, d,
               (CASE WHEN d = 15 THEN n0 * 3 ELSE n0 END)
                 + (CASE WHEN event_type = 'click' AND d >= 16 THEN 40 ELSE 0 END) AS n
        FROM daily0),
      tm AS (
        SELECT event_type, COUNT(*) AS np,
               SUM(d) AS sx, SUM(n) AS sy, SUM(d*d) AS sxx, SUM(d*n) AS sxy
        FROM daily GROUP BY 1),
      trend AS (
        SELECT event_type, np AS n_pts,
               CASE WHEN np*sxx - sx*sx <> 0
                    THEN CAST(np*sxy - sx*sy AS DOUBLE) / CAST(np*sxx - sx*sx AS DOUBLE)
               END AS slope,
               CASE WHEN np*sxx - sx*sx <> 0
                    THEN CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(np*sxx - sx*sx AS DOUBLE)
               END AS intercept
        FROM tm),
      win AS (
        SELECT event_type, d, n,
               COUNT(*) OVER wdw AS w, SUM(n) OVER wdw AS s, SUM(n*n) OVER wdw AS q
        FROM daily
        WINDOW wdw AS (PARTITION BY event_type ORDER BY d
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
      anom AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN (w*n - s)*(w*n - s) > 4*(w*q - s*s)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flags
        FROM win GROUP BY 1),
      lagged AS (
        SELECT event_type,
               CAST(n AS DECIMAL(19,0)) AS xa, CAST(n AS DECIMAL(18,0)) AS xb,
               LEAD(n, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1
        FROM daily),
      pairs AS (
        SELECT event_type, xa, xb,
               CAST(y1 AS DECIMAL(19,0)) AS ya, CAST(y1 AS DECIMAL(18,0)) AS yb
        FROM lagged WHERE y1 IS NOT NULL),
      mo AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(xa) AS sx, SUM(ya) AS sy,
               SUM(xa * xb) AS sxx, SUM(ya * yb) AS syy, SUM(xa * yb) AS sxy
        FROM pairs GROUP BY 1
        HAVING CAST(COUNT(*) AS DOUBLE) * CAST(SUM(xa * xb) AS DOUBLE)
                 - CAST(SUM(xa) AS DOUBLE) * CAST(SUM(xa) AS DOUBLE) > 0
           AND CAST(COUNT(*) AS DOUBLE) * CAST(SUM(ya * yb) AS DOUBLE)
                 - CAST(SUM(ya) AS DOUBLE) * CAST(SUM(ya) AS DOUBLE) > 0),
      acf1 AS (
        SELECT event_type,
               CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                  sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1e6) AS BIGINT) AS acf1_u
        FROM mo),
      ctot AS (
        SELECT event_type, CAST(COUNT(*) AS DECIMAL(18,0)) AS nn,
               CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DECIMAL(28,0)) AS tt
        FROM daily GROUP BY 1),
      cpre AS (
        SELECT event_type, d,
               SUM(CAST(n AS DECIMAL(19,0))) OVER wdw AS p,
               CAST(ROW_NUMBER() OVER wdw AS DECIMAL(19,0)) AS idx
        FROM daily
        WINDOW wdw AS (PARTITION BY event_type ORDER BY d)),
      csc AS (
        SELECT cpre.event_type, cpre.d,
               CAST(cpre.p * t.nn - cpre.idx * t.tt AS DECIMAL(38,0)) AS s
        FROM cpre JOIN ctot t ON t.event_type = cpre.event_type),
      cus AS (
        SELECT event_type, d AS t_star, CAST(s AS VARCHAR) AS s_star FROM (
          SELECT event_type, d, s,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(s) DESC, d) AS rn
          FROM csc)
        WHERE rn = 1)
      SELECT t.event_type, t.n_pts, t.slope, t.intercept,
             a.n_flags, f.acf1_u, c.t_star, c.s_star
      FROM trend t
      LEFT JOIN anom a ON a.event_type = t.event_type
      LEFT JOIN acf1 f ON f.event_type = t.event_type
      LEFT JOIN cus c ON c.event_type = t.event_type
      ORDER BY t.event_type""")),

    // Retention-cohort matrix, the SCALE SHAPE (EventsOps
    // .retentionCohorts): q76 computes daily retention in the textbook
    // form — distinct user-days self-joined against per-user first
    // days (3 shuffles, the user-day table crossing the exchange
    // twice). This is the same family rewritten the way a 100 TB
    // events table needs it: TWO shuffles, NO self-join — per-user
    // collect_set of active weeks (bounded by the CALENDAR, not the
    // corpus: at most weeks-since-launch entries per user, the
    // strongest kind of bound), cohort = array_min, one explode, one
    // (cohort, offset) count. The oracle deliberately takes q76's
    // textbook join shape — same answer, independently derived, so the
    // rewrite's equivalence is driver-checked. Raw exact counts; rates
    // are the caller's division (§5). Activity = purchase
    // events (any-event activity is so dense every user cohorts into
    // week 0 — a one-row matrix checks nothing; the sparser conversion
    // signal spreads first-activity across cohorts at every sf). The
    // oracle takes the textbook distinct-user-weeks ⋈ first-week shape
    // — same answer, independently derived.
    QueryDef("q178_retention", (s, dir) => {
      import s.implicits._
      EventsOps.retentionCohorts(
          Tables.load(s, dir, "events").filter($"event_type" === "purchase"),
          epoch = "2024-01-01", periodDays = 7)
        .orderBy($"cohort", $"offset")
    }, Some(RETENTION_ORACLE_SQL)),

    // STREAMING retention (StreamingRetention.newUserPeriods): the
    // (user, period) first-sight extractor as a live operator — per-user
    // state is the CALENDAR-bounded set of active periods, and each
    // (user, period) row is emitted exactly once, never retracted. The
    // replay is deliberately ARBITRARY shuffled micro-batches (the q131
    // discipline): first-sight is set membership — order-free — so the
    // landed row set, rolled up to the cohort matrix, must equal q178's
    // batch answer bit-for-bit; the oracle IS q178's, verbatim. The
    // rollup over the landed distinct pairs is the answer-sized batch
    // half (the q97 two-half pattern).
    QueryDef("q183_stream_retention", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"user_id",
          floor(datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .cast("double") / 7).cast("long").as("w")) // floor ÷, like EventsOps
      val stream = EventsStream.replayShuffled(ev, nFiles = 4)
        .as[StreamingRetention.UW]
      val uw = StreamingRetention.newUserPeriods(s, stream)
      val sink = s"q183_uw_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = uw.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink)
        .groupBy($"user_id")
        .agg(min($"w").as("cohort"), collect_list($"w").as("ws"))
        .select($"cohort", explode($"ws").as("w"))
        .groupBy($"cohort", ($"w" - $"cohort").as("offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort", $"offset")
    }, Some(RETENTION_ORACLE_SQL))
  )

  /** Markov transition matrix of the per-user event sequence — "what do
    * users do AFTER a signup?", the sequence-mining complement of q75's
    * ordered funnel (fixed path) and q119's token bigrams (text, not
    * behavior). Consecutive (event_type → next event_type) pairs within
    * each user's (ts, event_id)-ordered stream; per-user windows are
    * bounded by one user's activity (the q26 contract). Probability is
    * EXACT integer: p_u = n_ab·1e6 ⌊/⌋ n_a (one integer division —
    * stronger than the §5 float protocol); row-sum Σ_b p_u ∈
    * (1e6 − fanout, 1e6] by construction. */
  /** Burst-collapse debounce (EventsOps.debounce) summarized per
    * (user, type): raw vs kept counts + the collapse total. eps = 6 h
    * keeps the gate non-degenerate (~11% of events collapse at sf0.01). */
  /** Shared by q164 (batch) and q168 (streamed pairs → same counts).
    * Declared BEFORE the defs that reference it — a later-in-file val
    * would still be null during their object initialization. */
  private val TRANSITIONS_ORACLE_SQL = """
      WITH pairs AS (
        SELECT event_type AS src,
               LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events),
      cnt AS (SELECT src, dst, COUNT(*) AS n FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT src, SUM(n) AS n_src FROM cnt GROUP BY 1)
      SELECT c.src, c.dst, c.n, CAST(t.n_src AS BIGINT) AS n_src,
             CAST(c.n * 1000000 // t.n_src AS BIGINT) AS p_u
      FROM cnt c JOIN tot t ON t.src = c.src
      ORDER BY c.src, c.dst"""

  private val debounceDef = QueryDef("q166_debounce", (s, dir) => {
    import s.implicits._
    EventsOps.debounce(Tables.load(s, dir, "events"), epsSec = 21600L)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"user_id", $"event_type")
  }, Some("""
      WITH g AS (
        SELECT user_id, event_type,
               CASE WHEN LAG(ts) OVER wdw IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER wdw) > 21600000000
                    THEN 1 ELSE 0 END AS nb
        FROM events
        WINDOW wdw AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
      SELECT user_id, event_type, COUNT(*) AS n_raw,
             CAST(SUM(nb) AS BIGINT) AS n_kept
      FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** STREAMING burst-collapse debounce (StreamingDebounce ∘ the q168
    * ordered-replay protocol): q166's islands semantics as live O(1)
    * state — ONE chain-end timestamp per (user, type) forever. Four
    * event-time-split micro-batches; streamed kept-flags equal the
    * batch operator's row for row, so the oracle is q166's SQL
    * verbatim — hash equality proves no burst decision flips across a
    * batch boundary (the chain-end state is the whole answer). */
  private val streamDebounceDef = QueryDef("q174_stream_debounce", (s, dir) => {
    import s.implicits._
    val raw = Tables.load(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"), $"event_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).as("d"))
    val batches = Seq(
      raw.filter($"d" < 8), raw.filter($"d" >= 8 && $"d" < 16),
      raw.filter($"d" >= 16 && $"d" < 23), raw.filter($"d" >= 23)
    ).map(_.drop("d"))
    val kept = StreamingDebounce.debounce(s,
      EventsStream.replayOrdered(batches).as[StreamingDebounce.Ev], epsSec = 21600L)
    s.catalog.dropTempView("q174_sink")
    val q = EventsStream.toMemorySink(kept.toDF(), "q174_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try q.processAllAvailable() finally q.stop()
    s.table("q174_sink")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"user_id", $"event_type")
  }, Some("""
      WITH g AS (
        SELECT user_id, event_type,
               CASE WHEN LAG(ts) OVER wdw IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER wdw) > 21600000000
                    THEN 1 ELSE 0 END AS nb
        FROM events
        WINDOW wdw AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
      SELECT user_id, event_type, COUNT(*) AS n_raw,
             CAST(SUM(nb) AS BIGINT) AS n_kept
      FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val transitionsDef = QueryDef("q164_transitions", (s, dir) => {
    import s.implicits._
    EventsOps.transitions(Tables.load(s, dir, "events"))
      .orderBy($"src", $"dst")
  }, Some(TRANSITIONS_ORACLE_SQL))

  /** STREAMING event-sequence transitions (StreamingTransitions ∘ the
    * q117 ordered-replay protocol): q164's pair extraction as live
    * bounded state — ONE (ts, event_id, type) triple per user forever —
    * with the counts downstream plain batch aggregation over the sink's
    * emitted pairs. Four event-time-split micro-batches (day <8 / <16 /
    * <23 / rest); streamed pairs == batch lead() pairs row for row, so
    * the oracle is q164's SQL verbatim — hash equality proves the
    * stateful sequencing loses/duplicates nothing across batch
    * boundaries. */
  private val streamTransitionsDef = QueryDef("q168_stream_transitions", (s, dir) => {
    import s.implicits._
    val raw = Tables.load(s, dir, "events")
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"event_type",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).as("d"))
    val batches = Seq(
      raw.filter($"d" < 8), raw.filter($"d" >= 8 && $"d" < 16),
      raw.filter($"d" >= 16 && $"d" < 23), raw.filter($"d" >= 23)
    ).map(_.drop("d"))
    val pairs = StreamingTransitions.pairs(s,
      EventsStream.replayOrdered(batches).as[StreamingTransitions.Ev])
    s.catalog.dropTempView("q168_sink")
    val q = EventsStream.toMemorySink(pairs.toDF(), "q168_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try q.processAllAvailable() finally q.stop()
    // n_src via a window over the answer-sized count table — a
    // cnt⋈cnt self-join trips attribute-conflict resolution on memory
    // sinks (the q153 discipline)
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy($"src")
    s.table("q168_sink").groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
      .withColumn("n_src", sum($"n").over(wSrc))
      .select($"src", $"dst", $"n", $"n_src",
        expr("(n * 1000000L) div n_src").as("p_u"))
      .orderBy($"src", $"dst")
  }, Some(TRANSITIONS_ORACLE_SQL))
}

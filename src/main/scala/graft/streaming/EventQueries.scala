package graft.streaming

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

object EventQueries {

  val defs: Seq[QueryDef] = Seq(

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
    }, Some("""
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
      FROM sess GROUP BY user_id ORDER BY user_id""")),

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
      ORDER BY c.event_id"""))
  )
}

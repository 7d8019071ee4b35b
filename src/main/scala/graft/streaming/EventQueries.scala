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
      FROM sess GROUP BY user_id ORDER BY user_id"""))
  )
}

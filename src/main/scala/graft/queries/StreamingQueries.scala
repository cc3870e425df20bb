package graft.queries

import graft.sources.Tables
import graft.streaming.EventStream

/** Streaming-surface queries. The driver gate runs the batch form of
  * the exact transformation the streaming job uses (same function).
  */
object StreamingQueries extends QueryModule {

  override def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_stream_window",
      "tumbling 1h window counts/sums per event type (batch == stream)",
      (s, dir) => EventStream.windowedCounts(Tables(s, dir).events),
      Some("""SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),

    QueryDef(
      "q_sessionize",
      "session assignment (30-min gap) via window boundary flags",
      (s, dir) =>
        graft.streaming.Sessionize.sessionsSql(Tables(s, dir).events, 1800L),
      Some("""WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
             |b AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
             |                       OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS boundary
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
             |sx AS (SELECT *, CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM b)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |       min(sec) AS start_sec, max(sec) AS end_sec
             |FROM sx GROUP BY user_id, session_idx""".stripMargin)
    ),

    // Same result as q_sessionize via the skew-safe two-phase plan:
    // bucket-local windows then a per-user merge over SESSIONS — the
    // shape that survives a hot user at 100 TB. Same oracle.
    QueryDef(
      "q_sessionize_skew",
      "skew-safe sessionization: 1h-bucket local sessions + boundary merge",
      (s, dir) =>
        graft.streaming.Sessionize.sessionsSkewSafe(
          Tables(s, dir).events, 1800L, bucketSec = 3600L),
      Some("""WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
             |b AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
             |                       OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS boundary
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
             |sx AS (SELECT *, CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM b)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |       min(sec) AS start_sec, max(sec) AS end_sec
             |FROM sx GROUP BY user_id, session_idx""".stripMargin)
    ),

    QueryDef(
      "q_stream_json_props",
      "JSON property extraction from the event props column",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        Tables(s, dir).events
          .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
             |FROM events GROUP BY 1""".stripMargin)
    )
  )
}

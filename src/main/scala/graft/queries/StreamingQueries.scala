package graft.queries

import org.apache.spark.sql.functions._

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
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
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

    // ---- as-of join: each purchase ← latest prior view per user ----
    // One shuffle (merged-timeline window), vs DuckDB's native ASOF.
    QueryDef(
      "q_asof_join",
      "as-of join: purchases matched to the latest preceding view per user",
      (s, dir) => {
        val e = Tables(s, dir).events
          .selectExpr("user_id", "event_type", "ts div 1000000000 AS sec")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("sec").as("p_sec"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("sec").as("v_sec"))
        graft.operators.TemporalJoin
          .asOf(purchases, views, Seq("user_id"), "p_sec", "v_sec", Seq("v_sec"))
          .agg(count(lit(1)).as("n_purchases"),
            count(col("matched_v_sec")).as("n_matched"),
            sum(col("p_sec") - col("matched_v_sec")).cast("long").as("sum_lag"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
             |p AS (SELECT user_id, sec AS p_sec FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, sec AS v_sec FROM e WHERE event_type = 'view')
             |SELECT count(*) AS n_purchases, count(v_sec) AS n_matched,
             |       CAST(sum(p_sec - v_sec) AS BIGINT) AS sum_lag
             |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.p_sec >= v.v_sec""".stripMargin)
    ),

    // ---- range join: view → purchase within 30 min, per user ----
    // Time-bin blocking (≤2 bins per left row), never a key-only
    // cross product; DuckDB verifies with the plain inequality join.
    QueryDef(
      "q_range_join",
      "interval join: purchases 1..1800s after a view by the same user",
      (s, dir) => {
        val e = Tables(s, dir).events
          .selectExpr("user_id", "event_type", "ts div 1000000000 AS sec")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("sec").as("v_sec"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("sec").as("p_sec"))
        graft.operators.TemporalJoin
          .range(views, purchases, Seq("user_id"), "v_sec", "p_sec", 1L, 1800L, Nil)
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
             |v AS (SELECT user_id, sec AS v_sec FROM e WHERE event_type = 'view'),
             |p AS (SELECT user_id, sec AS p_sec FROM e WHERE event_type = 'purchase')
             |SELECT count(*) AS n_pairs, count(DISTINCT v.user_id) AS n_users
             |FROM v JOIN p ON v.user_id = p.user_id
             |             AND p.p_sec BETWEEN v.v_sec + 1 AND v.v_sec + 1800""".stripMargin)
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

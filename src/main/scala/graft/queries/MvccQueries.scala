package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Mvcc
import graft.sources.Tables

/** MVCC snapshot reads and copy-on-write mutation, driven over a
  * deterministic versioned view of `events` so DuckDB can replay the
  * exact same visibility arithmetic (SURVEY §2.7).
  */
object MvccQueries extends QueryModule {

  /** events → versioned rows: tx_min = event_id % 97,
    * tx_max = tx_min + 5 for every third event (deleted later),
    * null otherwise. Pure arithmetic, SQL-replicable.
    */
  private def versionedEvents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir).events
      .withColumn("tx_min", col("event_id") % 97)
      .withColumn("tx_max",
        when(col("event_id") % 3 === 0, col("event_id") % 97 + 5).cast("long"))

  private val versionedSql =
    """SELECT *, event_id % 97 AS tx_min,
      |  CASE WHEN event_id % 3 = 0 THEN event_id % 97 + 5 END AS tx_max
      |FROM events""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    // ---- snapshot read at a transaction id ----
    QueryDef(
      "q_mvcc_snapshot",
      "snapshot visibility predicate at tx=50 (serial history)",
      (s, dir) =>
        Mvcc.readAsOf(versionedEvents(s, dir), 50L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_visible")),
      // serial-case visibility (committed ≡ tx_min < T, plus the row's
      // own creator): tx_min <= T AND (tx_max IS NULL OR tx_max > T)
      Some(s"""SELECT event_type, count(*) AS n_visible FROM ($versionedSql)
              |WHERE tx_min <= 50 AND (tx_max IS NULL OR tx_max > 50)
              |GROUP BY event_type""".stripMargin)
    ),

    // ---- time travel: visible-row counts across snapshots ----
    QueryDef(
      "q_mvcc_time_travel",
      "row counts as of tx 10/50/90 over the same version chains",
      (s, dir) => {
        val v = versionedEvents(s, dir)
        def at(tx: Long) =
          Mvcc.readAsOf(v, tx).agg(count(lit(1)).as("n")).select(lit(tx).as("as_of"), col("n"))
        at(10L).unionAll(at(50L)).unionAll(at(90L))
      },
      Some(s"""WITH v AS ($versionedSql)
              |SELECT t.as_of, (SELECT count(*) FROM v
              |  WHERE tx_min <= t.as_of AND (tx_max IS NULL OR tx_max > t.as_of)) AS n
              |FROM (VALUES (10), (50), (90)) AS t(as_of)""".stripMargin)
    ),

    // ---- copy-on-write update: close old version, append new ----
    // tx 200 doubles the value of 'purchase' events; as-of 300 the new
    // versions are visible, the closed ones are not.
    QueryDef(
      "q_mvcc_update_cow",
      "copy-on-write update then snapshot read of the new versions",
      (s, dir) => {
        val v  = versionedEvents(s, dir)
        val v2 = Mvcc.update(v, col("event_type") === "purchase", 200L,
          df => df.withColumn("value", col("value") * 2))
        Mvcc.readAsOf(v2, 300L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").cast("double").as("sum_value"))
      },
      Some(s"""WITH v AS ($versionedSql),
              |vis AS (SELECT * FROM v
              |  WHERE tx_min <= 200 AND (tx_max IS NULL OR tx_max > 200)),
              |v2 AS (
              |  SELECT event_type, value, tx_min,
              |         CASE WHEN event_type = 'purchase' AND tx_min <= 200
              |                   AND (tx_max IS NULL OR tx_max > 200)
              |              THEN 200 ELSE tx_max END AS tx_max
              |  FROM v
              |  UNION ALL
              |  SELECT event_type, value * 2 AS value, 200 AS tx_min, NULL AS tx_max
              |  FROM vis WHERE event_type = 'purchase')
              |SELECT event_type, count(*) AS n,
              |       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
              |FROM v2
              |WHERE tx_min <= 300 AND (tx_max IS NULL OR tx_max > 300)
              |GROUP BY event_type""".stripMargin)
    ),

    // ---- compaction: drop versions dead to every reader >= horizon ----
    // Row counts before/after compacting at horizon 50, plus a
    // post-horizon snapshot read that compaction must not change
    // (the free-space defrag analog, SURVEY §4; spec: MvccSpec).
    QueryDef(
      "q_mvcc_compact",
      "version-store compaction at horizon 50: size shrinks, reads unchanged",
      (s, dir) => {
        val v = versionedEvents(s, dir)
        val c = Mvcc.compact(v, 50L)
        def n(df: org.apache.spark.sql.DataFrame, phase: String) =
          df.agg(count(lit(1)).as("n")).select(lit(phase).as("phase"), col("n"))
        n(v, "all_versions")
          .unionAll(n(c, "after_compact"))
          .unionAll(n(Mvcc.readAsOf(c, 100L), "visible_at_100"))
      },
      Some(s"""WITH v AS ($versionedSql)
              |SELECT 'all_versions' AS phase, count(*) AS n FROM v
              |UNION ALL SELECT 'after_compact', count(*) FROM v
              |  WHERE tx_max IS NULL OR tx_max >= 50
              |UNION ALL SELECT 'visible_at_100', count(*) FROM v
              |  WHERE (tx_max IS NULL OR tx_max >= 50)
              |    AND tx_min <= 100 AND (tx_max IS NULL OR tx_max > 100)""".stripMargin)
    ),

    // ---- rollback purge: aborted transactions physically removed ----
    // The data half of deleteTx (MVCC.hs:301-312): staged creates of
    // aborted txs {7, 12} are dropped, staged deletes re-opened, and a
    // snapshot read over the purged frame equals the plain serial read
    // (an aborted id never satisfied the committed predicate anyway) —
    // the invariant that lets TxLog.forgetAborted drop the markers.
    // The marker-lifecycle composite (abort→purge→forget→read) is
    // TxLogSpec's case; this gates the rewrite arithmetic.
    QueryDef(
      "q_mvcc_purge_aborted",
      "physical purge of aborted txs 7 and 12: sizes shrink, visible reads unchanged",
      (s, dir) => {
        val v = versionedEvents(s, dir)
        val p = Mvcc.purgeAborted(v, Set(7L, 12L))
        def n(df: org.apache.spark.sql.DataFrame, phase: String) =
          df.agg(count(lit(1)).as("n")).select(lit(phase).as("phase"), col("n"))
        // committed-for-50 net of the aborted ids — on the PURGED frame
        // this must equal the plain serial read (nothing references
        // 7/12 anymore); hash-compared against exactly that
        val vis = Mvcc.visible(50L, c => c < 50 && !c.isin(7, 12))
        n(v, "all_versions")
          .unionAll(n(p, "after_purge"))
          .unionAll(n(p.filter(vis), "visible_at_50"))
      },
      Some(s"""WITH v AS ($versionedSql),
              |p AS (SELECT event_type, tx_min,
              |        CASE WHEN tx_max IN (7, 12) THEN NULL ELSE tx_max END AS tx_max
              |      FROM v WHERE tx_min NOT IN (7, 12))
              |SELECT 'all_versions' AS phase, count(*) AS n FROM v
              |UNION ALL SELECT 'after_purge', count(*) FROM p
              |UNION ALL SELECT 'visible_at_50', count(*) FROM p
              |  WHERE tx_min <= 50 AND (tx_max IS NULL OR tx_max > 50)""".stripMargin)
    ),

    // ---- delete: closed versions disappear from later snapshots ----
    QueryDef(
      "q_mvcc_delete",
      "MVCC delete of error events at tx 200; before/after counts",
      (s, dir) => {
        val v  = versionedEvents(s, dir)
        val v2 = Mvcc.delete(v, col("event_type") === "error", 200L)
        Mvcc.readAsOf(v2, 199L).agg(count(lit(1)).as("n"))
          .select(lit("before").as("phase"), col("n"))
          .unionAll(Mvcc.readAsOf(v2, 300L).agg(count(lit(1)).as("n"))
            .select(lit("after").as("phase"), col("n")))
      },
      Some(s"""WITH v AS ($versionedSql),
              |v2 AS (SELECT event_type, tx_min,
              |         CASE WHEN event_type = 'error'
              |                   AND tx_min <= 200 AND (tx_max IS NULL OR tx_max > 200)
              |              THEN 200 ELSE tx_max END AS tx_max FROM v)
              |SELECT 'before' AS phase, count(*) AS n FROM v2
              |WHERE tx_min <= 199 AND (tx_max IS NULL OR tx_max > 199)
              |UNION ALL
              |SELECT 'after', count(*) FROM v2
              |WHERE tx_min <= 300 AND (tx_max IS NULL OR tx_max > 300)""".stripMargin)
    )
  )
}

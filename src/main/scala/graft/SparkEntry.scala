package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.Catalog`; this object is the
  * thin adapter the driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A traversal — the engine's core custom surface: property
    * filter, edge expansion, property projection in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q_trav_has_oute").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Deferred oracles render here (after the queries ran — Verify's
    * dump order); a thunk that fails drops ONLY its own entry, so one
    * broken query cannot zero the whole round's correctness gate.
    */
  def oracleSql: Map[String, String] = oracleSqlFor(None)

  /** [[oracleSql]] restricted to `names` BEFORE rendering: deferred
    * oracles of filtered-out queries must not be evaluated at all —
    * their builds never ran under the filter, so rendering them can
    * only waste work and log failure-looking noise.
    */
  def oracleSqlFor(names: Option[Set[String]]): Map[String, String] =
    Catalog.all.filter(q => names.forall(_.contains(q.name))).flatMap { q =>
      try q.oracle.get.map(q.name -> _)
      catch {
        case e: Throwable =>
          System.err.println(s"[oracle] ${q.name}: oracle render failed: ${e.getMessage}")
          None
      }
    }.toMap
}

package graft.queries

import scala.language.implicitConversions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle SQL for a query — either a fixed string (the common case)
  * or DEFERRED: rendered only when the dump asks for it, AFTER the
  * Spark queries ran. Deferral exists for queries whose exact SQL
  * depends on values the run itself produces (e.g. trained IVF
  * centroids emitted as literals): Verify runs every query first and
  * dumps oracle_sql.json last, so a deferred thunk can read state the
  * query's build recorded. The implicit view from `Option[String]`
  * keeps every plain-SQL QueryDef call site unchanged.
  */
final class Oracle private (private val thunk: Option[() => String]) {
  /** Rendered SQL; deferred thunks evaluate here. */
  def get: Option[String] = thunk.map(_())
}

object Oracle {
  implicit def fromOption(o: Option[String]): Oracle = new Oracle(o.map(s => () => s))
  def deferred(f: => String): Oracle = new Oracle(Some(() => f))
}

/** A named, driver-verifiable query.
  *
  * `build` produces the Spark plan over the parquet tables in `dir`;
  * `oracle`, when present, is the equivalent ANSI SQL that DuckDB runs
  * over the same parquet files (driver correctness gate). Column names
  * MUST match between the two — the compare sorts columns by name and
  * hashes values.
  */
final case class QueryDef(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Oracle)

trait QueryModule {
  def queries: Seq[QueryDef]

  /** DuckDB-side table reference: the driver exposes each parquet
    * table under its bare name (`lineitem`, `orders`, ...).
    */
  protected def tbl(name: String): String = name
}

/** Registry of every query module in the engine. */
object Catalog {
  def modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    GraphQueries,
    MvccQueries,
    IndexQueries,
    DedupQueries,
    SimilarityQueries,
    PcaQueries,
    PqQueries,
    SqQueries,
    TextQueries,
    BpeQueries,
    RetrievalQueries,
    LayoutQueries,
    MultimodalQueries,
    AnalyticsQueries,
    StreamingQueries
  )

  lazy val all: Seq[QueryDef] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}

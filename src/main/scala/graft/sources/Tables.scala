package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — Catalyst handles predicate pushdown,
  * column pruning and partition pruning on top of these; callers never
  * need to pre-filter.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `ts` normalized to the engine's canonical epoch-nano LONG —
    * see [[Tables.normalizeEventTs]].
    */
  def events: DataFrame =
    Tables.normalizeEventTs(Tables.readEvents(spark, s"$dir/events.parquet"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {

  /** Read the raw events parquet, enabling the legacy nanos-as-long
    * conf ONLY when the footer actually carries TIMESTAMP(NANOS) —
    * Spark's converter rejects that type outright, so the need is
    * detected by the first read attempt failing. The common
    * TIMESTAMP(MICROS) drop leaves the session conf untouched (no
    * side effect on unrelated parquet reads); for a genuine nano drop
    * the conf must stay set for the session, because the SCAN (not
    * just schema inference) consults it — there is no per-read option.
    */
  private[graft] def readEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Exception
          if String.valueOf(e.getMessage).contains("NANOS") ||
            Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("NANOS")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  /** The raw events schema (for explicit streaming-source schemas),
    * with the same conditional nano handling as [[readEvents]].
    */
  private[graft] def eventsSchema(spark: SparkSession,
      path: String): org.apache.spark.sql.types.StructType =
    readEvents(spark, path).schema

  /** Normalize the events table's `ts` to the engine's canonical
    * representation: a LONG of epoch NANOSECONDS.
    *
    * The driver's `events.parquet` has shipped `ts` as parquet
    * TIMESTAMP(NANOS) (read as epoch-nano longs via the legacy conf)
    * in earlier data drops and as TIMESTAMP(MICROS) — surfacing as
    * TIMESTAMP_NTZ — in the current one; downstream operators
    * (sessionization, temporal joins, windowed streams) are written
    * once against the long form and stay agnostic to the drop.
    *
    * The NTZ branch converts with `timestampdiff(MICROSECOND, epoch,
    * ts)` — pure field arithmetic on the naive timestamp, so the
    * result is independent of JVM default AND session timezone (the
    * gate's timezone probe would catch a cast through TimestampType,
    * which interprets NTZ in session-local time).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // legacy nanos-as-long drop: already canonical
      case TimestampNTZType =>
        df.withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case TimestampType =>
        // tz-adjusted micros ARE an instant: unix_micros is exact
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported events.ts type $other: expected LONG epoch nanos, " +
            "TIMESTAMP_NTZ, or TIMESTAMP")
    }
}

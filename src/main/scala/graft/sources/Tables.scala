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
  def events: DataFrame = {
    // legacy data drops stored ts as parquet TIMESTAMP(NANOS), which
    // Spark's converter rejects unless read as a LONG of epoch nanos;
    // harmless for the current TIMESTAMP(MICROS) files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {

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

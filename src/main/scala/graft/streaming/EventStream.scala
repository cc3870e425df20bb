package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion over the `events` table — the
  * engine's streaming surface (the reference's closest analog is the
  * write-behind WriteEvent queue, STMGraph Raw.hs:253-306; SURVEY
  * §2.10 marks this an extension, not parity).
  *
  * The transformation is defined ONCE ([[windowedCounts]]) and runs
  * identically in batch (driver correctness gate) and streaming
  * (readStream + watermark) — the standard Spark unification.
  */
object EventStream {

  /** `ts` arrives as epoch nanos (see Tables.events); expose as a
    * proper timestamp column.
    */
  // integer division: epoch nanos ~1.7e18 exceed double's exact range,
  // so `/ 1000` in double arithmetic is off by 1us on ~1.5% of rows
  def tsCol: Column = timestamp_micros(expr("ts div 1000"))

  /** Tumbling-window counts per event type. `window_start` is epoch
    * seconds (integer — timezone-proof for the oracle).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ets", tsCol)
      .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming variant: parquet source + 10-minute watermark. The
    * watermark bounds state (late rows beyond it are dropped) — at
    * scale this is what keeps windowed state O(active windows).
    */
  def streamingWindowedCounts(spark: SparkSession, dir: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS); read ts as epoch-nano
    // longs (same conf Tables.events uses for the batch path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the streaming file source wants a directory: stream the sf dir
    // with a glob filter selecting only the events table
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    src.withColumn("ets", tsCol)
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("window_start"), col("event_type"), col("n"))
  }

  /** Streaming exact dedup: duplicates dropped by key with state
    * bounded by the watermark (`dropDuplicatesWithinWatermark`) —
    * the streaming leg of the dedup surface: at-least-once upstream
    * delivery becomes exactly-once rows downstream, with state that
    * expires instead of growing with the corpus.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withColumn("ets", tsCol)
      .withWatermark("ets", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the streaming query to completion against the (finite)
    * parquet source into a named memory sink; returns the query.
    */
  def runToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = streamingWindowedCounts(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}

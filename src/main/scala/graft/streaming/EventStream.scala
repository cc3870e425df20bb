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
        // exact decimal sum (order-independent), emitted as DOUBLE:
        // decimal output types hash differently across engines in the
        // driver gate even when pinned to the same precision
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").cast("double").as("sum_value"))
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

  /** Stream-stream interval join: purchases 1..1800 s after a view by
    * the same user, BOTH sides unbounded streams. This is the
    * streaming form of [[graft.operators.TemporalJoin.range]] (same
    * bounds, same pairs — pinned by spec): Spark keeps both sides'
    * rows in join state and the watermark + the two-sided time bound
    * let it evict a row once no future match can arrive — the state
    * stays O(events per watermark horizon), not O(stream). At scale
    * the watermark is THE knob: without it a stream-stream join's
    * state grows without bound.
    */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ets", tsCol)
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ets").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ets").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") + expr("INTERVAL 1 SECOND") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1800 SECONDS"))
      .select(col("v_user").as("user_id"),
        unix_timestamp(col("v_ts")).as("v_sec"),
        unix_timestamp(col("p_ts")).as("p_sec"))
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

  /** Streaming graph ingestion — the reference's write-behind writer
    * (WriteEvent queue -> files, STMGraph Raw.hs:253-306) as a
    * foreachBatch upsert sink: each micro-batch's events become user
    * nodes merged into the snapshot under one MVCC transaction
    * (existing versions closed, fresh ones appended), then the new
    * snapshot version is published. Batch id doubles as the tx id —
    * exactly-once via Structured Streaming's batch-id replay contract.
    */
  def upsertUsersIntoSnapshot(spark: SparkSession, srcDir: String,
      snapshotDir: String): StreamingQuery = {
    import org.apache.spark.sql.functions.{count => cnt}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$srcDir/events.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(srcDir)

    src.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val tx = batchId + 1
      val incoming = batch.groupBy(col("user_id")).agg(cnt(lit(1)).as("n"))
        .select(col("user_id").as("id"), lit("user").as("label"),
          graft.model.PropValues.propsMap(
            "events" -> graft.model.PropValues.pvInt(col("n"))).as("props"))
      // localCheckpoint materializes the current version and cuts its
      // lineage to the files we are about to overwrite (Spark rejects
      // reading and overwriting the same path in one plan)
      val current =
        if (graft.core.GraphSnapshot.readManifest(snapshotDir).isDefined)
          graft.core.GraphSnapshot.open(batch.sparkSession, snapshotDir).nodes
            .localCheckpoint(true)
        else batch.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          graft.core.GraphSnapshot.nodeSchema)
      // close existing versions of arriving users (broadcast join, no
      // driver collect), append fresh ones
      val arriving = broadcast(incoming.select(col("id").as("__a")))
      val closed = current.join(arriving, col("id") === col("__a"), "left")
        .withColumn("tx_max",
          when(col("__a").isNotNull && col("tx_max").isNull, lit(tx))
            .otherwise(col("tx_max")))
        .drop("__a")
      val fresh = incoming
        .withColumn("tx_min", lit(tx)).withColumn("tx_max", lit(null).cast("long"))
        .select(current.columns.map(col): _*)
      graft.core.GraphSnapshot(
        closed.unionAll(fresh),
        batch.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          graft.core.GraphSnapshot.edgeSchema)).write(snapshotDir)
      ()
    }.trigger(Trigger.AvailableNow()).start()
  }

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

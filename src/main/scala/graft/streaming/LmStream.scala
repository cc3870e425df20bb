package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipeline.{LmIndex, TextOps}

/** Streaming ingestion into the published n-gram count tables
  * ([[LmIndex.publish]]) — the LM member of the streaming append
  * family, under the shared [[StagedCommit]] staged-marker
  * exactly-once protocol.
  *
  * A batch's three count tables stage TOGETHER as `uni/`, `bi/`,
  * `tri/` subdirectories and promote with atomic per-file renames —
  * all-or-nothing, so a partially-visible batch (trigram counts
  * without their unigrams) cannot exist. Counts are additive segment
  * files (the [[LmIndex.append]] read-time-merge contract), so the
  * streamed index scores bit-identically to a full retrain on the
  * union. The token total rides a batch-keyed counter-delta file
  * written after the promote on BOTH the fresh and replay paths
  * (deterministic content + keyed name = idempotent; a crash between
  * promote and counter heals on retry) — the [[LexStream]] design.
  */
object LmStream {

  private def markerDir(root: String) = s"$root/_lm_applied"
  private def stagingDir(root: String) = s"$root/_lm_staging"

  /** The staging half of one batch (exposed for the crash-window
    * spec): the batch's three count tables under `staging`.
    */
  private[graft] def stageBatch(batch: DataFrame, staging: String): Unit = {
    val (uni, bi, tri) = LmIndex.counts(batch, "id", col("text"))
    uni.write.mode("overwrite").parquet(s"$staging/uni")
    bi.write.mode("overwrite").parquet(s"$staging/bi")
    tri.write.mode("overwrite").parquet(s"$staging/tri")
  }

  /** One micro-batch: stage + marker + promote + counter delta.
    * Returns the batch's token count, or None for a replay.
    *
    * Runs under the store's maintenance lock
    * ([[graft.core.MaintLock]], same rationale as
    * [[LexStream.appendBatch]]): a batch landing inside an
    * [[LmIndex.compactVersioned]] window would be marked applied yet
    * absent from the flipped version — with the lock it raises
    * StoreBusy and the stream's retry re-appends it against the new
    * version.
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, checkpointDir: String,
      batchId: Long, idCol: String, text: Column, root: String): Option[Long] =
    graft.core.MaintLock.withLock(root, "LmStream.appendBatch") {
      appendBatchLocked(spark, batch, checkpointDir, batchId, idCol, text, root)
    }

  private def appendBatchLocked(spark: SparkSession, batch: DataFrame,
      checkpointDir: String, batchId: Long, idCol: String, text: Column,
      root: String): Option[Long] = {
    LmIndex.readMeta(root): Unit // kind guard
    val b = batch.select(col(idCol).as("id"), text.as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val st = b.agg(sum(size(TextOps.tokens(col("text"))).cast("long"))).head()
      val dn = if (st.isNullAt(0)) 0L else st.getLong(0)
      val res = StagedCommit.run(markerDir(root), stagingDir(root), root,
          checkpointDir, batchId) { staging =>
        stageBatch(b, staging)
        dn
      }
      val keyFile = StagedCommit.keyToFile(StagedCommit.batchKey(checkpointDir, batchId))
      graft.core.Sidecar.writeString(s"${LmIndex.countersDir(root)}/$keyFile",
        s"n=$dn\n")
      res
    } finally { b.unpersist(blocking = false): Unit }
  }

  /** Watch `srcDir` for document parquet and ingest each micro-batch
    * into the LM index at `root`.
    */
  def ingestDocuments(spark: SparkSession, srcDir: String, schema: StructType,
      idCol: String, textCol: String, root: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    val rd = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(srcDir)
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, batch, checkpointDir, batchId, idCol, col(textCol), root)
          .foreach(onBatch(batchId, _))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

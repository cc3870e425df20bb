package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Ivf

/** Streaming ANN ingestion: micro-batches of embeddings append into a
  * published cell-partitioned IVF layout with FROZEN centroids —
  * `foreachBatch` → [[Ivf.appendPartitioned]], the streaming leg of
  * the O(batch) ingestion story (graph deltas: [[EventStream]]; text
  * bands / embed buckets: the incremental miners). Per micro-batch
  * cost is O(batch); probes see appended vectors on their next
  * partition listing; each batch's [[Ivf.IvfDrift]] feeds `onDrift`
  * so a monitor can trigger retrain + republish.
  *
  * Exactly-once: appends cannot be replayed by overwrite the way the
  * batch-id-keyed delta sinks can (the layout's cell directories are
  * shared), so applied batch ids are recorded in a sidecar and
  * replayed ids are SKIPPED. Batch ids are only meaningful relative
  * to a checkpoint — a checkpoint-less query restarts them at 0, and
  * a bare-id marker would then silently DROP never-seen data whose
  * batch id collides with an applied one — so `checkpointDir` is
  * REQUIRED and the marker is keyed by (checkpoint, batchId). Two
  * writers with different checkpoints appending to one layout dedupe
  * independently, which is correct: their batch id spaces are
  * unrelated. A crash between the data write and the marker write
  * re-appends that one batch; a production deployment closes that
  * window with a transactional commit protocol (staged files +
  * manifest swap), the same upgrade path as the snapshot manifest.
  * Sidecar I/O is java.nio — LOCAL-FILESYSTEM ONLY, like the other
  * layout metadata.
  */
object AnnStream {

  private def appliedPath(layout: String) =
    java.nio.file.Paths.get(layout, "_ivf_applied_batches")

  /** (checkpoint-token, batch-id) keys already appended to the layout. */
  def appliedBatches(layout: String): Set[String] = {
    val p = appliedPath(layout)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else java.nio.file.Files.readString(p).linesIterator.filter(_.nonEmpty).toSet
  }

  private def batchKey(checkpointDir: String, id: Long): String =
    s"${graft.queries.SessionPublish.token(checkpointDir)}:$id"

  /** One micro-batch: append unless this (checkpoint, id) was already
    * applied. Returns the drift report, or None for a skipped replay.
    * Factored out of the sink so the idempotency contract is directly
    * testable without simulating a mid-commit crash.
    */
  def appendBatch(batch: org.apache.spark.sql.DataFrame, checkpointDir: String,
      batchId: Long, vecCol: String, index: Ivf.IvfIndex,
      layoutPath: String): Option[Ivf.IvfDrift] = {
    val key = batchKey(checkpointDir, batchId)
    if (appliedBatches(layoutPath).contains(key)) None
    else {
      val drift = Ivf.appendPartitioned(batch, vecCol, index, layoutPath)
      java.nio.file.Files.writeString(appliedPath(layoutPath), s"$key\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      Some(drift)
    }
  }

  /** Watch `srcDir` for embedding parquet files and append each
    * micro-batch into the layout at `layoutPath` (published by
    * [[Ivf.writePartitioned]] with `index` — the sidecar fingerprint
    * guard applies). Columns of the stream must include `vecCol`.
    * `checkpointDir` anchors both Structured Streaming's source
    * tracking and the append markers (see the idempotency note above).
    */
  def appendEmbeddings(spark: SparkSession, srcDir: String, vecCol: String,
      index: Ivf.IvfIndex, layoutPath: String, checkpointDir: String,
      onDrift: (Long, Ivf.IvfDrift) => Unit = (_, _) => ()): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema).parquet(srcDir)
    src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        appendBatch(batch, checkpointDir, batchId, vecCol, index, layoutPath)
          .foreach(onDrift(batchId, _))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

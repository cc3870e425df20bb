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
  * replayed ids are SKIPPED — idempotent under Structured Streaming's
  * batch-id replay contract for a single writer. A crash between the
  * data write and the marker write re-appends that one batch; a
  * production deployment closes that window with a transactional
  * commit protocol (staged files + manifest swap), the same upgrade
  * path as the snapshot manifest. Sidecar I/O is java.nio —
  * LOCAL-FILESYSTEM ONLY, like the other layout metadata.
  */
object AnnStream {

  private def appliedPath(layout: String) =
    java.nio.file.Paths.get(layout, "_ivf_applied_batches")

  /** Batch ids already appended to the layout by this sink. */
  def appliedBatches(layout: String): Set[Long] = {
    val p = appliedPath(layout)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else java.nio.file.Files.readString(p).linesIterator
      .filter(_.nonEmpty).map(_.toLong).toSet
  }

  private def markApplied(layout: String, id: Long): Unit =
    java.nio.file.Files.writeString(appliedPath(layout), s"$id\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

  /** Watch `srcDir` for embedding parquet files and append each
    * micro-batch into the layout at `layoutPath` (published by
    * [[Ivf.writePartitioned]] with `index` — the sidecar fingerprint
    * guard applies). Columns of the stream must include `vecCol`.
    */
  def appendEmbeddings(spark: SparkSession, srcDir: String, vecCol: String,
      index: Ivf.IvfIndex, layoutPath: String,
      checkpointDir: Option[String] = None,
      onDrift: (Long, Ivf.IvfDrift) => Unit = (_, _) => ()): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val w = src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!appliedBatches(layoutPath).contains(batchId)) {
          val drift = Ivf.appendPartitioned(batch, vecCol, index, layoutPath)
          markApplied(layoutPath, batchId)
          onDrift(batchId, drift)
        }
    }
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.trigger(Trigger.AvailableNow()).start()
  }
}

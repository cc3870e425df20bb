package graft

import org.apache.spark.sql.functions._

import graft.core.Sidecar
import graft.pipeline.{LmIndex, TextOps}
import graft.streaming.LmStream

/** Streaming LM-count ingestion: streamed counts score bit-identically
  * to a full retrain on the union, a writer killed on either side of
  * the marker lands its batch (all three tables + the token counter)
  * exactly once, and replays are no-ops.
  */
class LmStreamSpec extends GraftSuite {
  import spark.implicits._

  private def docs = graft.sources.Tables(spark, sf001).documents
    .select(col("doc_id"), col("text"))

  private def scores(root: String, probe: org.apache.spark.sql.DataFrame) =
    LmIndex.score(spark, root, probe, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("streamed counts == full retrain, bit for bit") {
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val b1 = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("lm-stream").toString + "/lm"
    LmIndex.publish(base, "doc_id", col("text"), root)

    val srcDir = java.nio.file.Files.createTempDirectory("lm-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lm-stream-ckpt").toString
    b1.coalesce(1).write.mode("append").parquet(srcDir)
    b2.coalesce(1).write.mode("append").parquet(srcDir)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    LmStream.ingestDocuments(spark, srcDir, docs.schema, "doc_id", "text",
        root, ckpt, maxFilesPerTrigger = Some(1),
        onBatch = (id, _) => batches.synchronized { batches += id: Unit })
      .awaitTermination()
    assert(batches.toSet == Set(0L, 1L))

    val probe = docs.filter(col("doc_id") % 7 === 3)
    val direct = TextOps.stupidBackoffLogProb(docs, probe, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(scores(root, probe) === direct,
      "streamed LM must score like a full retrain on the union")

    // replay: no-op, counters stable
    val metaBefore = LmIndex.readMeta(root)
    assert(LmStream.appendBatch(spark, b1, ckpt, 0L, "doc_id", col("text"), root).isEmpty)
    assert(LmIndex.readMeta(root) === metaBefore)
  }

  test("a writer killed on either side of the marker lands the batch once") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("lm-crash").toString + "/lm"
    LmIndex.publish(base, "doc_id", col("text"), root)
    val ckpt = java.nio.file.Files.createTempDirectory("lm-crash-ckpt").toString
    val token = graft.queries.SessionPublish.token(ckpt)
    val probe = docs.filter(col("doc_id") % 7 === 3)

    // CRASH BEFORE MARKER: staged counts invisible; retry lands once
    LmStream.stageBatch(batch, s"$root/_lm_staging/${token}_0")
    assert(LmIndex.readMeta(root)("n").toLong ===
      base.agg(sum(size(TextOps.tokens(col("text"))))).head().getLong(0))
    assert(LmStream.appendBatch(spark, batch, ckpt, 0L, "id", col("text"), root).isDefined)
    val direct = TextOps.stupidBackoffLogProb(docs, probe, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(scores(root, probe) === direct,
      "retry after pre-marker crash lands the counts exactly once")

    // CRASH AFTER MARKER: retry reports replay, completes move + counter
    val batch2 = batch.select((col("id") + 900000L).as("id"), col("text"))
    LmStream.stageBatch(batch2, s"$root/_lm_staging/${token}_1")
    Sidecar.writeString(s"$root/_lm_applied/${token}_1", "")
    assert(LmStream.appendBatch(spark, batch2, ckpt, 1L, "id", col("text"), root).isEmpty)
    assert(!Sidecar.exists(s"$root/_lm_staging/${token}_1"))
    val doubled = docs.unionAll(docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val direct2 = TextOps.stupidBackoffLogProb(doubled, probe, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(scores(root, probe) === direct2,
      "recovery completes the move and the counter exactly once")
  }
}

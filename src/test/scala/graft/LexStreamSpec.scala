package graft

import org.apache.spark.sql.functions._

import graft.core.Sidecar
import graft.pipeline.Retrieval
import graft.streaming.LexStream

/** Streaming lexical-index ingestion: the streamed index scores
  * bit-identically to a batch republish of the union (BM25 and
  * phrase), a writer killed on either side of the marker lands its
  * batch and counters exactly once, and replays are no-ops.
  */
class LexStreamSpec extends GraftSuite {
  import spark.implicits._

  private def docs = graft.sources.Tables(spark, sf001).documents
    .select(col("doc_id"), col("text"))

  private val terms = Seq("slow", "hash", "batch")

  private def searchAll(root: String): Seq[(Long, Double, Long)] =
    Retrieval.searchIndex(spark, root, terms, 10)
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq

  test("streamed index == batch republish of the union, BM25 and phrase") {
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val b1 = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 =!= 0)

    val root = java.nio.file.Files.createTempDirectory("lex-stream").toString + "/idx"
    Retrieval.publishIndex(base, "doc_id", col("text"), root, buckets = 8)

    val srcDir = java.nio.file.Files.createTempDirectory("lex-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lex-stream-ckpt").toString
    b1.coalesce(1).write.mode("append").parquet(srcDir)
    b2.coalesce(1).write.mode("append").parquet(srcDir)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    LexStream.ingestDocuments(spark, srcDir, docs.schema, "doc_id", "text",
        root, ckpt, maxFilesPerTrigger = Some(1),
        onBatch = (id, _) => batches.synchronized { batches += id: Unit })
      .awaitTermination()
    assert(batches.toSet == Set(0L, 1L), s"expected two micro-batches, got $batches")

    val full = java.nio.file.Files.createTempDirectory("lex-stream-full").toString + "/idx"
    Retrieval.publishIndex(docs, "doc_id", col("text"), full, buckets = 8)
    assert(searchAll(root) === searchAll(full),
      "streamed BM25 must equal the full republish bit-for-bit")
    val phrStream = Retrieval.phraseSearchIndex(spark, root, terms)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val phrFull = Retrieval.phraseSearchIndex(spark, full, terms)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(phrStream === phrFull)

    // replay of an applied (checkpoint, id) is a no-op with stable counters
    val metaBefore = Retrieval.readLexMeta(root)
    assert(LexStream.appendBatch(spark, b1, ckpt, 0L, "doc_id", col("text"), root).isEmpty)
    assert(Retrieval.readLexMeta(root) === metaBefore,
      "a replayed batch must not bump counters")
  }

  test("a writer killed on either side of the marker lands the batch once") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("lex-crash").toString + "/idx"
    Retrieval.publishIndex(base, "doc_id", col("text"), root, buckets = 8)
    val ckpt = java.nio.file.Files.createTempDirectory("lex-crash-ckpt").toString
    val token = graft.queries.SessionPublish.token(ckpt)

    val full = java.nio.file.Files.createTempDirectory("lex-crash-full").toString + "/idx"
    Retrieval.publishIndex(docs, "doc_id", col("text"), full, buckets = 8)

    // CRASH BEFORE MARKER: staged postings are invisible and counters
    // untouched; the retry restages and lands exactly once
    LexStream.stageBatch(batch, s"$root/_lex_staging/${token}_0", buckets = 8)
    assert(Retrieval.readLexMeta(root)("n") ===
      Retrieval.readLexMeta(root)("n"), "smoke")
    val nBase = Retrieval.readLexMeta(root)("n").toLong
    assert(nBase === base.count(), "staged-but-uncommitted counters invisible")
    assert(LexStream.appendBatch(spark, batch, ckpt, 0L, "id", col("text"), root).isDefined)
    assert(searchAll(root) === searchAll(full),
      "retry after pre-marker crash lands the postings exactly once")
    assert(Retrieval.readLexMeta(root)("n").toLong === docs.count())

    // CRASH AFTER MARKER (before promote + counter write): the retry
    // reports a replay but completes the move AND the counter delta
    val batch2 = batch.select((col("id") + 900000L).as("id"), col("text"))
    LexStream.stageBatch(batch2, s"$root/_lex_staging/${token}_1", buckets = 8)
    Sidecar.writeString(s"$root/_lex_applied/${token}_1", "")
    assert(LexStream.appendBatch(spark, batch2, ckpt, 1L, "id", col("text"), root).isEmpty,
      "a committed batch reports as a replay")
    assert(!Sidecar.exists(s"$root/_lex_staging/${token}_1"),
      "recovery drops the staging directory")
    assert(Retrieval.readLexMeta(root)("n").toLong === docs.count() + batch2.count(),
      "recovery completes the counter delta exactly once")
    // and the postings themselves landed: the doubled docs now match
    val doubled = docs.unionAll(
      docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val full2 = java.nio.file.Files.createTempDirectory("lex-crash-full2").toString + "/idx"
    Retrieval.publishIndex(doubled, "doc_id", col("text"), full2, buckets = 8)
    assert(searchAll(root) === searchAll(full2))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.Sidecar
import graft.pipeline.Dedup
import graft.streaming.DedupStream

/** Streaming near-dup ingestion: the streamed store reproduces the
  * one-shot full mine pair-for-pair, replays are no-ops, a writer
  * killed on either side of the marker neither loses nor duplicates
  * a batch (docs, bands, AND pairs move together), reingested ids
  * fail loud, and the geometry sidecar refuses mismatched banding
  * parameters.
  */
class DedupStreamSpec extends GraftSuite {

  private val P = DedupStream.Params(0.7)

  private def docs = graft.sources.Tables(spark, sf001).documents
    .select(col("doc_id"), col("text"))

  test("streamed store == one-shot full mine; replay skips; reingest fails loud") {
    val base = docs.filter(col("doc_id") % 7 =!= 3)
    val b1 = docs.filter(col("doc_id") % 7 === 3 && col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 7 === 3 && col("doc_id") % 2 =!= 0)

    val root = java.nio.file.Files.createTempDirectory("dedup-stream").toString + "/store"
    DedupStream.publish(base, "doc_id", col("text"), P, root)

    val srcDir = java.nio.file.Files.createTempDirectory("dedup-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-stream-ckpt").toString
    b1.coalesce(1).write.mode("append").parquet(srcDir)
    b2.coalesce(1).write.mode("append").parquet(srcDir)

    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    DedupStream.ingestDocuments(spark, srcDir, docs.schema, "doc_id", "text", P,
        root, ckpt, maxFilesPerTrigger = Some(1),
        onBatch = (id, n) => batches.synchronized { batches += id -> n: Unit })
      .awaitTermination()
    assert(batches.map(_._1).toSet == Set(0L, 1L),
      s"maxFilesPerTrigger=1 over two files must run two micro-batches, got $batches")

    // the defining invariant: streamed pairs == one-shot full mine
    val streamed = spark.read.parquet(DedupStream.pairsPath(root))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val oneShot = Dedup.nearDuplicates(docs, "doc_id", col("text"), P.threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.length == streamed.toSet.size, "no pair may surface twice")
    assert(streamed.toSet == oneShot.toSet,
      "streamed store must reproduce the full-corpus mine pair-for-pair")

    // docs and bands grew consistently
    assert(spark.read.parquet(DedupStream.docsPath(root)).count() == docs.count())
    assert(spark.read.parquet(DedupStream.bandsPath(root)).count() ==
      Dedup.bandTable(docs, "doc_id", col("text")).count())

    // direct replay of an applied (checkpoint, id): a no-op
    val pairsBefore = spark.read.parquet(DedupStream.pairsPath(root)).count()
    assert(DedupStream.appendBatch(spark, b1, ckpt, 0L, "doc_id", col("text"), P, root).isEmpty,
      "an applied (checkpoint, batch-id) must be skipped")
    assert(spark.read.parquet(DedupStream.pairsPath(root)).count() == pairsBefore)

    // the same docs under a DIFFERENT checkpoint are not a replay —
    // they hit the id-disjointness guard LOUDLY instead of silently
    // corrupting the pair invariant
    val ckpt2 = java.nio.file.Files.createTempDirectory("dedup-stream-ckpt2").toString
    intercept[IllegalArgumentException] {
      DedupStream.appendBatch(spark, b1, ckpt2, 0L, "doc_id", col("text"), P, root)
    }
  }

  test("a writer killed on either side of the marker lands the batch exactly once") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("dedup-crash").toString + "/store"
    DedupStream.publish(base, "doc_id", col("text"), P, root)
    val docsBefore = spark.read.parquet(DedupStream.docsPath(root)).count()
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-crash-ckpt").toString
    val token = graft.queries.SessionPublish.token(ckpt)

    // the union-state expectations, computed once
    val all = docs
    val expectDocs = all.count()
    val expectPairs = Dedup.nearDuplicates(all, "doc_id", col("text"), P.threshold).count()

    // CRASH BEFORE MARKER: staged but uncommitted — invisible; the
    // retry restages (overwrite) and lands exactly once
    DedupStream.stageBatch(spark, batch, s"$root/_dedup_staging/${token}_0", root, P)
    assert(spark.read.parquet(DedupStream.docsPath(root)).count() == docsBefore,
      "staged-but-uncommitted docs must be invisible")
    assert(DedupStream.appendBatch(spark, batch, ckpt, 0L, "id", col("text"), P, root).isDefined,
      "an uncommitted batch is new work, not a replay")
    assert(spark.read.parquet(DedupStream.docsPath(root)).count() == expectDocs,
      "retry after pre-marker crash lands the docs exactly once")
    assert(spark.read.parquet(DedupStream.pairsPath(root)).count() == expectPairs,
      "retry after pre-marker crash lands the pairs exactly once")

    // CRASH AFTER MARKER: committed but unmoved — the retry finishes
    // the move without re-mining or duplicating. Stage a disjoint
    // second batch for it (ids 900k+ so the disjointness guard is
    // quiet about the already-ingested ones).
    val batch2 = batch.select((col("id") + 900000L).as("id"), col("text"))
    DedupStream.stageBatch(spark, batch2, s"$root/_dedup_staging/${token}_1", root, P)
    Sidecar.writeString(s"$root/_dedup_applied/${token}_1", "")
    assert(DedupStream.appendBatch(spark, batch2, ckpt, 1L, "id", col("text"), P, root).isEmpty,
      "a committed batch reports as a replay")
    assert(spark.read.parquet(DedupStream.docsPath(root)).count() ==
      expectDocs + batch2.count(),
      "recovery after post-marker crash completes the move without duplicating")
    assert(!Sidecar.exists(s"$root/_dedup_staging/${token}_1"),
      "recovery drops the staging directory")
  }

  test("versioned republish: geometry changes swap atomically; appends follow the resolve") {
    val base = docs.filter(col("doc_id") < 60)
    val vroot = java.nio.file.Files.createTempDirectory("dedup-vroot").toString + "/store"
    assert(DedupStream.publishVersioned(base, "doc_id", col("text"), P, vroot) == 1L)
    val v1 = graft.core.Versions.currentPath(vroot).get

    // a stream appends against the resolved version
    val batch = docs.filter(col("doc_id") >= 60 && col("doc_id") < 70)
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-vroot-ckpt").toString
    assert(DedupStream.appendBatch(spark, batch, ckpt, 0L, "doc_id", col("text"),
      P, v1).isDefined)

    // republish with NEW geometry: next version, pointer flip; the
    // old version (incl. its append) is still complete
    val p2 = P.copy(numHashes = 32, bands = 8)
    assert(DedupStream.publishVersioned(docs.filter(col("doc_id") < 70),
      "doc_id", col("text"), p2, vroot) == 2L)
    val v2 = graft.core.Versions.currentPath(vroot).get
    assert(v2 != v1)
    assert(spark.read.parquet(DedupStream.docsPath(v1)).count() == 70,
      "superseded version keeps serving its complete store")

    // old-geometry appends to the new resolve fail loud; new-geometry work
    val b2 = docs.filter(col("doc_id") >= 70 && col("doc_id") < 80)
    intercept[IllegalArgumentException] {
      DedupStream.appendBatch(spark, b2, ckpt, 1L, "doc_id", col("text"), P, v2)
    }
    assert(DedupStream.appendBatch(spark, b2, ckpt, 1L, "doc_id", col("text"),
      p2, v2).isDefined)
  }

  test("geometry sidecar refuses mismatched banding parameters") {
    val base = docs.filter(col("doc_id") < 50)
    val root = java.nio.file.Files.createTempDirectory("dedup-geom").toString + "/store"
    DedupStream.publish(base, "doc_id", col("text"), P, root)
    val batch = docs.filter(col("doc_id") >= 50 && col("doc_id") < 60)
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-geom-ckpt").toString
    intercept[IllegalArgumentException] {
      DedupStream.appendBatch(spark, batch, ckpt, 0L, "doc_id", col("text"),
        P.copy(numHashes = 32, bands = 8), root)
    }
    intercept[IllegalArgumentException] {
      DedupStream.appendBatch(spark, batch, ckpt, 0L, "doc_id", col("text"), P,
        root + "-nowhere")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.Sidecar
import graft.pipeline.{Ivf, Similarity}
import graft.streaming.AnnStream

/** Streaming ANN ingestion: micro-batches append into the published
  * cell-partitioned layout, probes surface them exactly, replayed
  * (checkpoint, batch-id) keys are skipped, a later run over the same
  * checkpoint picks up only NEW source files, and the staged commit
  * protocol survives a writer killed on either side of the marker
  * without duplicating or losing a row.
  */
class AnnStreamSpec extends GraftSuite {

  private def embSchema = graft.sources.Tables(spark, sf001).embeddings.schema

  test("streamed batches surface exactly; replay skips; new files still ingest") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val base   = emb.filter(col("vec_id") % 4 =!= 0 || col("vec_id") === 0L)
    val batch1 = emb.filter(col("vec_id") % 4 === 0 && col("vec_id") % 8 =!= 0)
    val batch2 = emb.filter(col("vec_id") % 8 === 0 && col("vec_id") =!= 0L)

    val idx = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
    val layout = java.nio.file.Files.createTempDirectory("ann-stream-layout").toString
    Ivf.writePartitioned(base, "embedding", idx, layout)
    val baseCount = spark.read.parquet(layout).count()

    val srcDir = java.nio.file.Files.createTempDirectory("ann-stream-src").toString
    val ckpt   = java.nio.file.Files.createTempDirectory("ann-stream-ckpt").toString
    batch1.write.mode("append").parquet(srcDir)

    val drifts = scala.collection.mutable.ArrayBuffer.empty[(Long, Ivf.IvfDrift)]
    AnnStream.appendEmbeddings(spark, srcDir, embSchema, "embedding", idx, layout, ckpt,
      onDrift = (id, d) => drifts.synchronized { drifts += id -> d: Unit })
      .awaitTermination()

    val afterFirst = spark.read.parquet(layout).count()
    assert(afterFirst == baseCount + batch1.count(), "every streamed vector appended once")
    assert(drifts.nonEmpty, "drift reported per applied batch")
    assert(drifts.forall(!_._2.drifted()), s"in-distribution stream flagged: $drifts")

    // direct replay of an applied (checkpoint, id): a no-op, reported as such
    val replay = AnnStream.appendBatch(batch1, ckpt, 0L, "embedding", idx, layout)
    assert(replay.isEmpty, "an applied (checkpoint, batch-id) must be skipped")
    assert(spark.read.parquet(layout).count() == afterFirst, "replay appended nothing")

    // the same id under a DIFFERENT checkpoint is a different batch:
    // it must NOT be mistaken for the applied one (the bare-id marker
    // bug this keying scheme exists to prevent — only here the second
    // writer's data is genuinely new)
    val otherCkpt = java.nio.file.Files.createTempDirectory("ann-stream-ckpt2").toString
    assert(AnnStream.appendBatch(batch2, otherCkpt, 0L, "embedding", idx, layout).isDefined,
      "a different checkpoint's batch 0 is new data, not a replay")
    val afterSecond = spark.read.parquet(layout).count()
    assert(afterSecond == afterFirst + batch2.count(), "new writer's batch appended")

    // full probe over the streamed layout == brute force over everything
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val exact = Similarity.topK(emb.filter(col("vec_id") =!= 0L),
        "vec_id", "embedding", qv.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val got = Ivf.topKPartitioned(spark, layout, "vec_id", "embedding",
        idx, qv, 10, nprobe = 8, pred = col("vec_id") =!= 0L)
      .collect().map(_.getLong(0)).toSet
    assert(got == exact, "streamed vectors must surface exactly in probed search")

    // a second run over the SAME checkpoint with new source files
    // ingests ONLY the new files (source tracking + marker combined).
    // label is written as INT to match the corpus schema — and the
    // stream's schema is EXPLICIT, so even a mistyped file would fail
    // deterministically instead of by file-listing-order lottery.
    val batch3 = spark.createDataFrame(Seq((900001L, 7, Seq.fill(64)(0.5f))))
      .toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label").cast("int"),
        col("embedding").cast("array<float>"))
    batch3.write.mode("append").parquet(srcDir)
    AnnStream.appendEmbeddings(spark, srcDir, embSchema, "embedding", idx, layout, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(layout).count() == afterSecond + 1,
      "second run over the same checkpoint ingests exactly the new file's rows")
  }

  test("a writer killed on either side of the marker neither loses nor duplicates a batch") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val base  = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val idx = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
    val layout = java.nio.file.Files.createTempDirectory("ann-crash-layout").toString
    Ivf.writePartitioned(base, "embedding", idx, layout)
    val baseCount = spark.read.parquet(layout).count()
    val ckpt = java.nio.file.Files.createTempDirectory("ann-crash-ckpt").toString
    val key  = graft.queries.SessionPublish.token(ckpt) + "_0"

    // CRASH BEFORE MARKER: the writer staged the batch's files and
    // died before committing. Nothing is visible; the retry restages
    // (overwrite) and commits — exactly one copy lands.
    Ivf.stagePartitioned(batch, "embedding", idx, layout, s"$layout/_ivf_staging/$key")
    assert(spark.read.parquet(layout).count() == baseCount,
      "staged-but-uncommitted files must be invisible to probes")
    assert(AnnStream.appendBatch(batch, ckpt, 0L, "embedding", idx, layout).isDefined,
      "an uncommitted batch is new work, not a replay")
    assert(spark.read.parquet(layout).count() == baseCount + batch.count(),
      "retry after pre-marker crash lands the batch exactly once")

    // CRASH AFTER MARKER: the writer committed (marker exists) and
    // died before moving the staged files in. The retry recognizes
    // the marker and finishes the move — still exactly one copy.
    val key1 = graft.queries.SessionPublish.token(ckpt) + "_1"
    Ivf.stagePartitioned(batch, "embedding", idx, layout, s"$layout/_ivf_staging/$key1")
    Sidecar.writeString(s"$layout/_ivf_applied/$key1", "")
    assert(AnnStream.appendBatch(batch, ckpt, 1L, "embedding", idx, layout).isEmpty,
      "a committed batch reports as a replay")
    assert(spark.read.parquet(layout).count() == baseCount + 2 * batch.count(),
      "recovery after post-marker crash completes the move without duplicating")
    assert(!Sidecar.exists(s"$layout/_ivf_staging/$key1"),
      "recovery drops the staging directory")

    // and a further replay of the same key is a pure no-op
    assert(AnnStream.appendBatch(batch, ckpt, 1L, "embedding", idx, layout).isEmpty)
    assert(spark.read.parquet(layout).count() == baseCount + 2 * batch.count())
  }
}

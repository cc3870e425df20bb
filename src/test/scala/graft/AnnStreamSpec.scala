package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Similarity}
import graft.streaming.AnnStream

/** Streaming ANN ingestion: micro-batches append into the published
  * cell-partitioned layout, probes surface them exactly, and replayed
  * batch ids are skipped (idempotent under the batch-id replay
  * contract).
  */
class AnnStreamSpec extends GraftSuite {

  test("streamed batches surface exactly in probed search; replay does not duplicate") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val base  = emb.filter(col("vec_id") % 4 =!= 0 || col("vec_id") === 0L)
    val batch = emb.filter(col("vec_id") % 4 === 0 && col("vec_id") =!= 0L)

    val idx = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
    val layout = java.nio.file.Files.createTempDirectory("ann-stream-layout").toString
    Ivf.writePartitioned(base, "embedding", idx, layout)
    val baseCount = spark.read.parquet(layout).count()

    // stage the batch as a parquet source dir the stream watches
    val srcDir = java.nio.file.Files.createTempDirectory("ann-stream-src").toString
    batch.write.mode("overwrite").parquet(srcDir)

    val drifts = scala.collection.mutable.ArrayBuffer.empty[(Long, Ivf.IvfDrift)]
    val q = AnnStream.appendEmbeddings(spark, srcDir, "embedding", idx, layout,
      onDrift = (id, d) => drifts.synchronized { drifts += id -> d: Unit })
    q.awaitTermination()

    val afterCount = spark.read.parquet(layout).count()
    assert(afterCount == baseCount + batch.count(), "every streamed vector appended once")
    assert(drifts.nonEmpty, "drift reported per applied batch")
    assert(drifts.forall(!_._2.drifted()), s"in-distribution stream flagged: $drifts")

    // full probe over the streamed layout == brute force over base ∪ batch
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val exact = Similarity.topK(emb.filter(col("vec_id") =!= 0L),
        "vec_id", "embedding", qv.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val got = Ivf.topKPartitioned(spark, layout, "vec_id", "embedding",
        idx, qv, 10, nprobe = 8, pred = col("vec_id") =!= 0L)
      .collect().map(_.getLong(0)).toSet
    assert(got == exact, "streamed vectors must surface exactly in probed search")

    // REPLAY: a fresh query without a checkpoint re-delivers batch 0;
    // the applied-batch sidecar makes the redelivery a no-op
    val q2 = AnnStream.appendEmbeddings(spark, srcDir, "embedding", idx, layout)
    q2.awaitTermination()
    assert(spark.read.parquet(layout).count() == afterCount,
      "replayed batch ids must be skipped, not re-appended")
    assert(AnnStream.appliedBatches(layout) == Set(0L), "marker records the applied id")
  }
}

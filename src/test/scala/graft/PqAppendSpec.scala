package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Pq}
import graft.streaming.AnnStream

/** Incremental ingestion for the compressed tier: batch and streaming
  * appends of PQ codes into a published IVF-PQ layout with frozen
  * indexes — append ≡ fresh publish of base ∪ batch (codes are
  * deterministic in the frozen codebooks), geometry/kind guards
  * refuse mismatches, quantization drift flags out-of-distribution
  * batches, and the streaming leg shares the exactly-once marker
  * protocol (replays are no-ops).
  */
class PqAppendSpec extends GraftSuite {

  private lazy val emb = graft.sources.Tables(spark, sf001).embeddings
  private lazy val base  = emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") === 0L)
  private lazy val batch = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0L)

  private lazy val coarse = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
  private lazy val pq  = Pq.train(spark, base, "vec_id", "embedding", nsub = 8, ksub = 16)
  private lazy val rpq = Pq.trainResidual(spark, base, "vec_id", "embedding", coarse,
    nsub = 8, ksub = 16)

  private def queryVec(): Array[Float] =
    emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray

  test("append equals a fresh publish of base ∪ batch, raw and residual") {
    for (residual <- Seq(false, true)) {
      val idx = if (residual) rpq else pq
      val appended = java.nio.file.Files.createTempDirectory("pq-app").toString + "/l"
      val fresh    = java.nio.file.Files.createTempDirectory("pq-fresh").toString + "/l"
      if (residual) {
        Pq.writePartitionedPqResidual(base, "vec_id", "embedding", coarse, idx, appended)
        Pq.writePartitionedPqResidual(emb, "vec_id", "embedding", coarse, idx, fresh)
      } else {
        Pq.writePartitionedPq(base, "vec_id", "embedding", coarse, idx, appended)
        Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, idx, fresh)
      }
      val drift = Pq.appendPartitionedPq(batch, "vec_id", "embedding", coarse, idx,
        appended, residual)
      assert(!drift.drifted(), s"in-distribution batch flagged (residual=$residual): $drift")

      // codes are deterministic in the frozen indexes: the appended
      // layout must hold row-identical (id, codes, cell) to the fresh
      // publish of the full corpus
      def rows(p: String) = spark.read.parquet(p)
        .select(col("vec_id"), col("codes").cast("array<int>"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
      assert(rows(appended) == rows(fresh),
        s"append != fresh publish (residual=$residual)")

      // and probed search over the appended layout equals the fresh one
      val q = queryVec()
      def top(p: String) = (if (residual)
          Pq.topKPartitionedPqResidual(spark, p, "vec_id", coarse, idx, q, 10,
            nprobe = 8, pred = col("vec_id") =!= 0L)
        else
          Pq.topKPartitionedPq(spark, p, "vec_id", coarse, idx, q, 10,
            nprobe = 8, pred = col("vec_id") =!= 0L))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(top(appended) == top(fresh))
    }
  }

  test("geometry and kind guards refuse mismatched appends") {
    val path = java.nio.file.Files.createTempDirectory("pq-guard").toString + "/l"
    Pq.writePartitionedPq(base, "vec_id", "embedding", coarse, pq, path)
    // wrong codebooks (trained on different data)
    val other = Pq.train(spark, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
      nsub = 8, ksub = 16)
    intercept[IllegalArgumentException] {
      Pq.appendPartitionedPq(batch, "vec_id", "embedding", coarse, other, path)
    }
    // wrong kind: residual append into a raw layout
    intercept[IllegalArgumentException] {
      Pq.appendPartitionedPq(batch, "vec_id", "embedding", coarse, rpq, path,
        residual = true)
    }
  }

  test("an out-of-distribution batch raises the quantization-drift ratio") {
    val path = java.nio.file.Files.createTempDirectory("pq-drift").toString + "/l"
    Pq.writePartitionedPq(base, "vec_id", "embedding", coarse, pq, path)
    // shift every vector far outside the trained distribution
    val shifted = batch.withColumn("embedding",
      transform(col("embedding"), x => x + lit(10.0f)))
    val drift = Pq.appendPartitionedPq(shifted, "vec_id", "embedding", coarse, pq, path)
    assert(drift.drifted(), s"a +10-shifted batch must flag: $drift")
    assert(drift.ratio > 2.0, s"expected a large recon-error ratio, got ${drift.ratio}")
  }

  test("streamed code batches surface exactly; replays are no-ops") {
    val layout = java.nio.file.Files.createTempDirectory("pq-stream").toString + "/l"
    Pq.writePartitionedPq(base, "vec_id", "embedding", coarse, pq, layout)
    val baseCount = spark.read.parquet(layout).count()

    val srcDir = java.nio.file.Files.createTempDirectory("pq-stream-src").toString
    val ckpt   = java.nio.file.Files.createTempDirectory("pq-stream-ckpt").toString
    batch.write.mode("append").parquet(srcDir)

    val drifts = scala.collection.mutable.ArrayBuffer.empty[(Long, Pq.PqDrift)]
    AnnStream.appendEmbeddingsPq(spark, srcDir, emb.schema, "vec_id", "embedding",
        coarse, pq, layout, ckpt,
        onDrift = (id, d) => drifts.synchronized { drifts += id -> d: Unit })
      .awaitTermination()

    assert(spark.read.parquet(layout).count() == baseCount + batch.count(),
      "every streamed vector's codes appended once")
    assert(drifts.nonEmpty && drifts.forall(!_._2.drifted()),
      s"in-distribution stream flagged: $drifts")

    // replay of the applied (checkpoint, batch-id): a no-op
    assert(AnnStream.appendBatchPq(batch, ckpt, 0L, "vec_id", "embedding",
      coarse, pq, layout).isEmpty, "an applied batch must be skipped")
    assert(spark.read.parquet(layout).count() == baseCount + batch.count())

    // streamed codes surface in probed search exactly like a publish
    val q = queryVec()
    val fresh = java.nio.file.Files.createTempDirectory("pq-stream-fresh").toString + "/l"
    Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, pq, fresh)
    def top(p: String) = Pq.topKPartitionedPq(spark, p, "vec_id", coarse, pq, q, 10,
        nprobe = 8, pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(layout) == top(fresh), "streamed codes must surface exactly")
  }
}

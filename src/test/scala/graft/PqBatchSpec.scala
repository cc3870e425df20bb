package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Pq, Tombstones}

/** Batch ADC kNN join over cell-partitioned PQ layouts, and the
  * [[graft.functions.PqLut]] per-row LUT expression behind it: the
  * column LUT is bit-for-bit the driver LUT, batch probe-all equals
  * per-query ADC, the residual variant equals its per-query search at
  * partial probe, the plan keeps the pruned-scan / broadcast /
  * narrow-shuffle shape of [[Ivf.topKBatch]], and tombstones hide ids.
  */
class PqBatchSpec extends GraftSuite {

  private val NSUB = 8
  private val KSUB = 256

  private lazy val emb = graft.sources.Tables(spark, sf001).embeddings

  private lazy val coarse = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
  private lazy val pq = Pq.train(spark, emb, "vec_id", "embedding", NSUB, KSUB)
  private lazy val rpq = Pq.trainResidual(spark, emb, "vec_id", "embedding", coarse, NSUB, KSUB)

  private lazy val plainPath: String = {
    val p = java.nio.file.Files.createTempDirectory("pq-batch").toString + "/layout"
    Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, pq, p)
    p
  }
  private lazy val residPath: String = {
    val p = java.nio.file.Files.createTempDirectory("pq-batch-r").toString + "/layout"
    Pq.writePartitionedPqResidual(emb, "vec_id", "embedding", coarse, rpq, p)
    p
  }

  test("PqLut column equals the driver-side adcLut bit-for-bit") {
    graft.functions.PqLut.register(spark)
    val rows = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"),
        graft.functions.PqLut.col(col("embedding"), pq.codebooks).as("lut"))
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val want = Pq.adcLut(pq, v)
      val got = r.getSeq[Seq[Double]](2)
      assert(got.length == NSUB)
      (0 until NSUB).foreach { s =>
        assert(got(s).toArray.sameElements(want(s)),
          s"vec ${r.getLong(0)} subspace $s: column LUT != driver LUT")
      }
    }
  }

  test("topKBatchAdc at nprobe=nlist equals per-query topKAdc") {
    val qs = emb.filter(col("vec_id") < 4)
    val got = Pq.topKBatchAdc(spark, plainPath, qs, "vec_id", "embedding",
        "vec_id", coarse, pq, k = 10, nprobe = coarse.nlist,
        pairFilter = col("q_id") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(t => (t._2, t._3)).toSet }
    assert(got.keySet == Set(0L, 1L, 2L, 3L), "every query answered")
    val codes = spark.read.parquet(plainPath)
    for (q <- got.keySet) {
      val qv = emb.filter(col("vec_id") === q).select("embedding")
        .head().getSeq[Float](0).toArray
      val single = Pq.topKAdc(spark, codes, "vec_id", pq, qv, 10,
          pred = col("vec_id") =!= q)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got(q) == single, s"query $q: batch ADC != per-query ADC")
    }
  }

  test("residual batch equals per-query residual search at partial probe") {
    val qs = emb.filter(col("vec_id") < 4)
    val got = Pq.topKBatchAdcResidual(spark, residPath, qs, "vec_id", "embedding",
        "vec_id", coarse, rpq, k = 10, nprobe = 2,
        pairFilter = col("q_id") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(t => (t._2, t._3)).toSet }
    for (q <- got.keySet) {
      val qv = emb.filter(col("vec_id") === q).select("embedding")
        .head().getSeq[Float](0).toArray
      val single = Pq.topKPartitionedPqResidual(spark, residPath, "vec_id",
          coarse, rpq, qv, 10, nprobe = 2, pred = col("vec_id") =!= q)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got(q) == single, s"query $q: residual batch != per-query residual search")
    }
  }

  test("batch ADC plan: pruned codes scan, broadcast LUT side, narrow rank shuffle") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val qs = emb.filter(col("vec_id") < 3)
      val df = Pq.topKBatchAdc(spark, plainPath, qs, "vec_id", "embedding",
        "vec_id", coarse, pq, k = 5, nprobe = 2)
      val plan = df.queryExecution.executedPlan

      graft.functions.NearestCells.register(spark)
      val wanted = qs.select(explode(
          graft.functions.NearestCells.col(col("embedding"), coarse.centroids, 2)).as("c"))
        .distinct().count()
      val corpusScans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("pq-batch")) => f
      }
      assert(corpusScans.nonEmpty, "plan reads the published codes layout")
      val partsRead = corpusScans.map(_.selectedPartitions.partitionCount).sum
      assert(partsRead == wanted,
        s"codes scan must read exactly the $wanted probed cells, read $partsRead")

      assert(plan.toString.contains("BroadcastHashJoin"),
        "cell-to-cell join must broadcast the LUT-carrying query side")
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1, s"expected one rank shuffle, got ${exchanges.size}")
      val shuffled = exchanges.head.child.schema.fieldNames.toSet
      assert(shuffled == Set("q_id", "vec_id", "adc_micros"),
        s"rank shuffle must carry integer-micro triples only: $shuffled")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("batch ADC honors tombstones") {
    val p = java.nio.file.Files.createTempDirectory("pq-batch-del").toString + "/layout"
    Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, pq, p)
    val qs = emb.filter(col("vec_id") === 0L)
    def top(): Seq[Long] = Pq.topKBatchAdc(spark, p, qs, "vec_id", "embedding",
        "vec_id", coarse, pq, k = 5, nprobe = coarse.nlist,
        pairFilter = col("q_id") =!= col("vec_id"))
      .collect().map(_.getLong(1)).toSeq
    val victims = top().take(2)
    import spark.implicits._
    Tombstones.delete(p, victims.toDF("vec_id"), "vec_id")
    val after = top()
    assert(victims.forall(v => !after.contains(v)), s"deleted $victims leaked into $after")
  }

  test("kind guards: batch readers refuse the wrong layout kind") {
    intercept[IllegalArgumentException] {
      Pq.topKBatchAdc(spark, residPath, emb.limit(1), "vec_id", "embedding",
        "vec_id", coarse, rpq, k = 5, nprobe = 2)
    }
    intercept[IllegalArgumentException] {
      Pq.topKBatchAdcResidual(spark, plainPath, emb.limit(1), "vec_id", "embedding",
        "vec_id", coarse, pq, k = 5, nprobe = 2)
    }
  }
}

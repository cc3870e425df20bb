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

  test("slabbed batch ADC equals the unsliced call, raw and residual") {
    val qs = emb.filter(col("vec_id") < 6)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val raw1 = key(Pq.topKBatchAdcSlabbed(spark, plainPath, qs, "vec_id", "embedding",
      "vec_id", coarse, pq, k = 10, nprobe = coarse.nlist, slabs = 1,
      pairFilter = col("q_id") =!= col("vec_id")))
    val raw3 = key(Pq.topKBatchAdcSlabbed(spark, plainPath, qs, "vec_id", "embedding",
      "vec_id", coarse, pq, k = 10, nprobe = coarse.nlist, slabs = 3,
      pairFilter = col("q_id") =!= col("vec_id")))
    assert(raw1 == raw3, "raw batch ADC: slabs=3 must equal slabs=1")
    assert(raw1.map(_._1) == Set(0L, 1L, 2L, 3L, 4L, 5L), "every query answered")

    val res1 = key(Pq.topKBatchAdcResidualSlabbed(spark, residPath, qs, "vec_id",
      "embedding", "vec_id", coarse, rpq, k = 10, nprobe = 2, slabs = 1,
      pairFilter = col("q_id") =!= col("vec_id")))
    val res3 = key(Pq.topKBatchAdcResidualSlabbed(spark, residPath, qs, "vec_id",
      "embedding", "vec_id", coarse, rpq, k = 10, nprobe = 2, slabs = 3,
      pairFilter = col("q_id") =!= col("vec_id")))
    assert(res1 == res3, "residual batch ADC: slabs=3 must equal slabs=1")

    intercept[IllegalArgumentException] {
      Pq.topKBatchAdcSlabbed(spark, plainPath, qs, "vec_id", "embedding",
        "vec_id", coarse, pq, k = 10, nprobe = 2, slabs = 0)
    }
  }

  test("batch ADC rerank at probe-all, full candidates is per-query brute force") {
    val qs = emb.filter(col("vec_id") < 3)
    val n = emb.count().toInt
    val got = Pq.topKBatchAdcRerank(spark, plainPath, emb, qs, "vec_id", "embedding",
        "vec_id", "embedding", coarse, pq, k = 10, candidates = n,
        nprobe = coarse.nlist, pairFilter = col("q_id") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(t => (t._2, t._3)).toSet }
    assert(got.keySet == Set(0L, 1L, 2L))
    for (q <- got.keySet) {
      val qv = emb.filter(col("vec_id") === q).select("embedding")
        .head().getSeq[Float](0).toSeq
      val exact = graft.pipeline.Similarity.topK(emb.filter(col("vec_id") =!= q),
          "vec_id", "embedding", qv, 10, graft.functions.CosineSim.col)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got(q) == exact, s"query $q: batch rerank != brute force")
    }
  }

  test("tuneAdcRerank meets the target recall — measured, not assumed") {
    val qs = emb.filter(col("vec_id") < 4)
    val t = Pq.tuneAdcRerank(spark, plainPath, emb, qs, "vec_id", "embedding",
      "vec_id", "embedding", coarse, pq, k = 10, targetRecall = 0.9,
      pairFilter = col("q_id") =!= col("vec_id"))
    assert(t.recall >= 0.9, s"tuner must meet the target, got $t")
    assert(t.nprobe >= 1 && t.nprobe <= coarse.nlist && t.candidates >= 10)

    // the chosen knobs REPRODUCE the measured recall
    val approx = Pq.topKBatchAdcRerank(spark, plainPath, emb, qs, "vec_id", "embedding",
      "vec_id", "embedding", coarse, pq, k = 10, candidates = t.candidates,
      nprobe = t.nprobe, pairFilter = col("q_id") =!= col("vec_id"))
    // exact leg: brute force over the corpus frame (the layout holds
    // codes, not raw vectors)
    val qvecs = qs.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb.crossJoin(org.apache.spark.sql.functions.broadcast(qvecs))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.CosineSim.col(col("embedding"), col("q_vec")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    val bf = scored.withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rk") <= 10).drop("rk")
    val measured = Ivf.recallOf(bf, approx, "vec_id")
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(measured >= 0.9, s"chosen knobs must reproduce the target recall, got $measured")

    // a non-empty sample with an empty ground-truth leg fails loud
    intercept[IllegalArgumentException] {
      Pq.tuneAdcRerank(spark, plainPath, emb, qs, "vec_id", "embedding",
        "vec_id", "embedding", coarse, pq, k = 10, targetRecall = 0.9,
        pairFilter = org.apache.spark.sql.functions.lit(false))
    }
    // an empty sample is vacuously tuned
    val t0 = Pq.tuneAdcRerank(spark, plainPath, emb,
      qs.filter(org.apache.spark.sql.functions.lit(false)), "vec_id", "embedding",
      "vec_id", "embedding", coarse, pq, k = 10, targetRecall = 0.9)
    assert(t0 == Pq.AdcTuning(1, 10, 1.0))
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

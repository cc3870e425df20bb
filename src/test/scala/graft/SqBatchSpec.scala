package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Pq, Sq}

/** Batch SQ kNN join over cell-partitioned SQ8 layouts, and the
  * [[graft.functions.SqWeights]] per-row weight expression behind it:
  * the column weights are bit-for-bit the driver weights, batch
  * equals per-query search at any probe depth, slabs are invisible,
  * the plan keeps the pruned-scan / broadcast / narrow-shuffle shape,
  * and the tuner meets its recall target measured against brute
  * force.
  */
class SqBatchSpec extends GraftSuite {

  private lazy val emb = graft.sources.Tables(spark, sf001).embeddings
  private lazy val coarse = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
  private lazy val sq = Sq.train(spark, emb, "embedding")
  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("sq-batch").toString + "/layout"
    Sq.writePartitionedSq(emb, "vec_id", "embedding", coarse, sq, p)
    p
  }

  test("SqWeights column equals the driver-side sqLut bit-for-bit") {
    graft.functions.SqWeights.register(spark)
    val rows = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"),
        graft.functions.SqWeights.col(col("embedding"), sq.lo, sq.step).as("w"))
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val want = Sq.sqLut(sq, v)
      val got = r.getSeq[Double](2)
      assert(got.length == sq.dim + 1)
      assert(got(0) == want.bias, s"vec ${r.getLong(0)}: column bias != driver bias")
      assert(got.drop(1).toArray.sameElements(want.w1),
        s"vec ${r.getLong(0)}: column w1 != driver w1")
    }
  }

  test("topKBatchSq equals per-query topKPartitionedSq at partial AND full probe") {
    val qs = emb.filter(col("vec_id") < 4)
    for (np <- Seq(2, coarse.nlist)) {
      val got = Sq.topKBatchSq(spark, path, qs, "vec_id", "embedding", "vec_id",
          coarse, sq, k = 10, nprobe = np, pairFilter = col("q_id") =!= col("vec_id"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(r => (r.getLong(1), r.getLong(2))).toSeq }
      assert(got.keySet == Set(0L, 1L, 2L, 3L), "every query answered")
      qs.collect().foreach { qr =>
        val q = qr.getLong(0)
        val qv = qr.getSeq[Float](qr.fieldIndex("embedding")).toArray
        val single = Sq.topKPartitionedSq(spark, path, "vec_id", coarse, sq, qv,
            k = 10, nprobe = np, pred = col("vec_id") =!= q)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got(q) == single, s"query $q at nprobe $np: batch != per-query")
      }
    }
  }

  test("batch SQ plan: pruned codes scan, broadcast weights side, narrow rank shuffle") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val qs = emb.filter(col("vec_id") < 3)
      val df = Sq.topKBatchSq(spark, path, qs, "vec_id", "embedding", "vec_id",
        coarse, sq, k = 5, nprobe = 2)
      val plan = df.queryExecution.executedPlan

      graft.functions.NearestCells.register(spark)
      val wanted = qs.select(explode(
          graft.functions.NearestCells.col(col("embedding"), coarse.centroids, 2)).as("c"))
        .distinct().count()
      val corpusScans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("sq-batch")) => f
      }
      assert(corpusScans.nonEmpty, "plan reads the published codes layout")
      val partsRead = corpusScans.map(_.selectedPartitions.partitionCount).sum
      assert(partsRead == wanted,
        s"codes scan must read exactly the $wanted probed cells, read $partsRead")
      assert(plan.toString.contains("BroadcastHashJoin"),
        "cell-to-cell join must broadcast the weight-carrying query side")
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1, s"expected one rank shuffle, got ${exchanges.size}")
      val shuffled = exchanges.head.child.schema.fieldNames.toSet
      assert(shuffled == Set("q_id", "vec_id", "sq_micros"),
        s"rank shuffle must carry integer-micro triples only: $shuffled")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("slabbed batch SQ equals the unsliced call") {
    val qs = emb.filter(col("vec_id") < 6)
    def run(slabs: Int) =
      Sq.topKBatchSqSlabbed(spark, path, qs, "vec_id", "embedding", "vec_id",
          coarse, sq, k = 5, nprobe = 2, slabs = slabs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = run(1)
    assert(one == run(3), "slabs=3 must equal slabs=1")
    assert(one.map(_._1) == Set(0L, 1L, 2L, 3L, 4L, 5L), "every query answered")
  }

  test("batch SQ rerank at probe-all, full candidates is per-query brute force") {
    graft.functions.CosineSim.register(spark)
    val qs = emb.filter(col("vec_id") < 3)
    val n = emb.count().toInt
    val got = Sq.topKBatchSqRerank(spark, path, emb, qs, "vec_id", "embedding",
        "vec_id", "embedding", coarse, sq, k = 5, candidates = n,
        nprobe = coarse.nlist, pairFilter = col("q_id") =!= col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(r => (r.getLong(1), r.getDouble(2))).toSet }
    assert(got.keySet == Set(0L, 1L, 2L))
    qs.collect().foreach { qr =>
      val q = qr.getLong(0)
      val qv = qr.getSeq[Float](qr.fieldIndex("embedding")).toArray
      val exact = emb.filter(col("vec_id") =!= q)
        .withColumn("cos", round(graft.functions.CosineSim.col(col("embedding"),
          typedLit(qv.toSeq)), 6))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
        .collect().map(r => (r.getLong(0), r.getDouble(r.fieldIndex("cos")))).toSet
      assert(got(q) == exact, s"query $q: batch rerank != brute force")
    }
  }

  test("tuneSqRerank meets the target recall — measured, not assumed") {
    val sample = emb.filter(col("vec_id") % 11 === 1)
    val t = Sq.tuneSqRerank(spark, path, emb, sample, "vec_id", "embedding",
      "vec_id", "embedding", coarse, sq, k = 10, targetRecall = 0.9,
      pairFilter = col("q_id") =!= col("vec_id"))
    assert(t.recall >= 0.9, s"tuner must meet the target, got $t")
    assert(t.nprobe >= 1 && t.nprobe <= coarse.nlist && t.candidates >= 10)
    // the chosen knobs reproduce the measured recall (exact leg =
    // brute force over the corpus frame; the layout holds codes)
    graft.functions.CosineSim.register(spark)
    val approx = Sq.topKBatchSqRerank(spark, path, emb, sample, "vec_id", "embedding",
      "vec_id", "embedding", coarse, sq, k = 10, candidates = t.candidates,
      nprobe = t.nprobe, pairFilter = col("q_id") =!= col("vec_id"))
    val qvecs = sample.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb.crossJoin(broadcast(qvecs))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.CosineSim.col(col("embedding"), col("q_vec")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    val bf = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10).drop("rk")
    val measured = Ivf.recallOf(bf, approx, "vec_id")
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(measured >= 0.9, s"chosen knobs must reproduce the target recall, got $measured")
  }
}

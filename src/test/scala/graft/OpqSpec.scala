package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Opq, Pq}

/** Optimized PQ: the rotation is orthonormal, the distributed MatVec
  * rotation is bit-for-bit the driver rotation, OPQ strictly beats
  * plain PQ where dimensions are unbalanced (the claim the module
  * exists for), never does worse on the gate corpus, and the ADC read
  * path over OPQ codes scores the rotated space exactly.
  */
class OpqSpec extends GraftSuite {

  private lazy val emb = graft.sources.Tables(spark, sf001).embeddings

  /** 512 deterministic rows, dim 8: all the variance lives in dims
    * 0..3 (one PQ subspace at nsub=2), dims 4..7 are near-constant —
    * the unbalanced layout plain PQ wastes half its code budget on and
    * the eigen-allocation init provably rebalances.
    */
  private def unbalanced = {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 512).map { i =>
      (i.toLong, Seq.tabulate(8)(j =>
        if (j < 4) (rnd.nextDouble() * 4.0 - 2.0).toFloat
        else (rnd.nextDouble() * 0.04 - 0.02).toFloat))
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  test("MatVec column equals the driver-side rotation bit-for-bit; rotation is orthonormal") {
    val idx = Opq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 16, opqIters = 2)
    val d = idx.dim
    assert(d == 64)

    // orthonormality within float rounding: max |RᵀR - I| tiny
    val rtr = Array.tabulate(d, d) { (i, j) =>
      (0 until d).map(k => idx.rotation(k)(i).toDouble * idx.rotation(k)(j).toDouble).sum
    }
    val maxDev = (for (i <- 0 until d; j <- 0 until d)
      yield math.abs(rtr(i)(j) - (if (i == j) 1.0 else 0.0))).max
    assert(maxDev < 1e-3, s"rotation must be orthonormal, max |RtR - I| = $maxDev")

    graft.functions.MatVec.register(spark)
    val rows = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"),
        Opq.rotate(col("embedding"), idx.rotation).as("y"))
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val want = Opq.rotateDriver(idx.rotation, v)
      val got = r.getSeq[Float](2).toArray
      assert(got.sameElements(want),
        s"vec ${r.getLong(0)}: MatVec rotation != driver rotation")
    }
  }

  test("OPQ strictly beats plain PQ on an unbalanced corpus at identical (nsub, ksub)") {
    val df = unbalanced
    val plain = Pq.train(spark, df, "vec_id", "embedding", nsub = 2, ksub = 16)
    val opq = Opq.train(spark, df, "vec_id", "embedding", nsub = 2, ksub = 16)
    val ePlain = Pq.meanReconError(df, "embedding", plain)
    val eOpq = Opq.meanReconError(df, "embedding", opq)
    assert(eOpq < 0.9 * ePlain,
      s"OPQ must rebalance the unbalanced corpus: $eOpq !< 0.9 * $ePlain")
  }

  test("OPQ never does worse than plain PQ on the gate corpus") {
    val plain = Pq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 64)
    val opq = Opq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 64)
    val ePlain = Pq.meanReconError(emb, "embedding", plain)
    val eOpq = Opq.meanReconError(emb, "embedding", opq)
    // the identity start's first iteration IS the plain index, and the
    // returned pair is best-by-measured-error, so worse is impossible
    // beyond summation-order ulps
    assert(eOpq <= ePlain * (1 + 1e-9),
      s"OPQ must never lose to plain PQ: $eOpq !<= $ePlain")
  }

  test("ADC over OPQ codes scores the rotated space exactly") {
    val idx = Opq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 16, opqIters = 2)
    val path = java.nio.file.Files.createTempDirectory("opq-codes").toString + "/codes"
    Opq.writeCodes(emb, "vec_id", "embedding", idx, path)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lut = Opq.adcLut(idx, q)

    val n = emb.count().toInt
    val got = Opq.topKAdc(spark, spark.read.parquet(path), "vec_id", idx, q, k = n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1).map(_ & 0xFF)))
    assert(stored.nonEmpty)
    stored.foreach { case (id, codes) =>
      val adc = codes.zipWithIndex.map { case (c, s) => lut(s)(c) }.reduceLeft(_ + _)
      val want = math.floor(adc * 1e6).toLong
      assert(got(id) == want, s"vec $id: got ${got(id)}, want $want")
    }
  }

  // ---- OPQ composed into the partitioned tier ----

  private def opqLayout(nlist: Int) = {
    val idx = Opq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 16, opqIters = 2)
    val coarse = Opq.trainCoarse(spark, emb, "vec_id", "embedding", idx, nlist)
    val dir = java.nio.file.Files.createTempDirectory("opq-ivf").toString + "/layout"
    Opq.writePartitionedOpq(emb, "vec_id", "embedding", coarse, idx, dir)
    (idx, coarse, dir)
  }

  private def qvec = emb.filter(col("vec_id") === 0L)
    .select(col("embedding")).head().getSeq[Float](0).toArray

  test("partitioned OPQ at probe-all equals the flat OPQ ADC scan; mismatched reads fail loud") {
    val (idx, coarse, dir) = opqLayout(nlist = 4)
    val q = qvec

    // probe-all partitioned search ≡ flat ADC over the same codes
    // (partitioning must change WHERE rows live, never their scores)
    val part = Opq.topKPartitionedOpq(spark, dir, "vec_id", coarse, idx, q,
      k = 20, nprobe = coarse.nlist, pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val flat = Opq.topKAdc(spark, spark.read.parquet(dir), "vec_id", idx, q,
      k = 20, pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(part.sameElements(flat), "partitioned probe-all != flat ADC")

    // a PLAIN Pq read of the rotated layout must refuse (unrotated
    // query LUT over rotated codes is silent garbage)
    val e1 = intercept[IllegalArgumentException] {
      Pq.topKPartitionedPq(spark, dir, "vec_id", coarse, idx.pq, q, 5, 2)
    }
    assert(e1.getMessage.contains("OPQ rotation"))

    // an OPQ read of a PLAIN layout must refuse symmetrically
    val plainDir = java.nio.file.Files.createTempDirectory("plain-ivfpq").toString + "/layout"
    val plainCoarse = graft.pipeline.Ivf.train(spark, emb, "vec_id", "embedding", nlist = 4)
    Pq.writePartitionedPq(emb, "vec_id", "embedding", plainCoarse, idx.pq, plainDir)
    val e2 = intercept[IllegalArgumentException] {
      Opq.topKPartitionedOpq(spark, plainDir, "vec_id", plainCoarse, idx, q, 5, 2)
    }
    assert(e2.getMessage.contains("rotation mismatch"))
  }

  test("batch ADC over the OPQ layout equals per-query search; appends keep the frozen geometry") {
    val idx = Opq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 16, opqIters = 2)
    val base  = emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") === 0L)
    val batch = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0L)
    val coarse = Opq.trainCoarse(spark, base, "vec_id", "embedding", idx, nlist = 4)

    // incremental: publish base, append batch with the frozen indexes
    val incDir = java.nio.file.Files.createTempDirectory("opq-inc").toString + "/layout"
    Opq.writePartitionedOpq(base, "vec_id", "embedding", coarse, idx, incDir)
    val drift = Opq.appendPartitionedOpq(batch, "vec_id", "embedding", coarse, idx, incDir)
    assert(drift.ratio > 0.0)

    // full republish with the SAME frozen indexes must read identically
    val fullDir = java.nio.file.Files.createTempDirectory("opq-full").toString + "/layout"
    Opq.writePartitionedOpq(emb, "vec_id", "embedding", coarse, idx, fullDir)
    val q = qvec
    val inc = Opq.topKPartitionedOpq(spark, incDir, "vec_id", coarse, idx, q,
      k = 15, nprobe = coarse.nlist, pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = Opq.topKPartitionedOpq(spark, fullDir, "vec_id", coarse, idx, q,
      k = 15, nprobe = coarse.nlist, pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(inc.sameElements(full), "append-built layout != full republish")

    // batch join at probe-all ≡ per-query search for each query id
    val queries = emb.filter(col("vec_id").isin(1L, 2L, 3L))
    val got = Opq.topKBatchAdcOpq(spark, fullDir, queries, "vec_id", "embedding",
      "vec_id", coarse, idx, k = 5, nprobe = coarse.nlist,
      pairFilter = col("q_id") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._2)).toMap
    Seq(1L, 2L, 3L).foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val want = Opq.topKPartitionedOpq(spark, fullDir, "vec_id", coarse, idx, qv,
        k = 5, nprobe = coarse.nlist, pred = col("vec_id") =!= qid)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
      assert(got(qid).toSeq == want.toSeq, s"batch != per-query for q_id=$qid")
    }
  }

  test("rerank over the OPQ layout returns exact raw-space cosine (rotation-invariant fetch-back)") {
    val (idx, coarse, dir) = opqLayout(nlist = 4)
    val q = qvec
    val n = emb.count().toInt
    // full-candidate, probe-all rerank degenerates to brute force
    val got = Opq.topKRerankPartitionedOpq(spark, dir, emb, "vec_id", "embedding",
      coarse, idx, q, k = 10, candidates = n, nprobe = coarse.nlist,
      pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    graft.functions.CosineSim.register(spark)
    val want = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"),
        round(graft.functions.CosineSim.col(col("embedding"),
          typedLit(q.toSeq)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(want), "OPQ rerank at full candidates != brute-force cosine")
  }
}

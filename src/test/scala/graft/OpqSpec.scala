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
}

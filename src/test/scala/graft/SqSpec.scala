package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Sq}

/** Scalar quantization (SQ8): the identities the module's contract
  * names.
  *
  *  - codes span the full 0..255 range (incl. the sign-wrap region)
  *    and decode within step/2 per dim on in-range values;
  *  - the distributed sqScore equals the driver-side weight fold
  *    bit-for-bit (the spec oracle for every downstream gate);
  *  - probe-all partitioned search degenerates to the flat scan;
  *  - append with the frozen geometry is row-identical to a fresh
  *    publish of the union; drift report sane;
  *  - geometry/kind guards: wrong index and wrong-tier layouts refuse
  *    loudly (silent-garbage class);
  *  - rerank at probe-all/full candidates is the brute-force cosine
  *    top-k.
  */
class SqSpec extends GraftSuite {

  /** 256 rows, dim 4: dim 0 ramps 0..255 (step exactly 1 after the
    * min/max train, so code == i and decode is EXACT), the others
    * exercise negative ranges, scaling, and a constant dim (step-0
    * guard).
    */
  private def rampCorpus = {
    val rows = (0 until 256).map { i =>
      (i.toLong, Seq(i.toFloat, -i.toFloat, 0.5f * i, 7f))
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  test("codes span 0..255, decode within step/2, constant dims safe") {
    val df = rampCorpus
    val idx = Sq.train(spark, df, "embedding")
    assert(idx.dim == 4)
    // dim 3 is constant: lo = 7, step forced to 1, every code 0
    assert(idx.lo(3) == 7f && idx.step(3) == 1.0)

    val got = df.select(col("vec_id"),
        Sq.encode(col("embedding"), idx).as("codes"),
        Sq.decode(Sq.encode(col("embedding"), idx), idx).as("recon"),
        col("embedding"))
      .collect()
    got.foreach { r =>
      val i = r.getLong(0).toInt
      val codes = r.getSeq[Byte](1).map(_ & 0xFF)
      assert(codes(0) == i, s"dim-0 ramp has step 1: vector $i must code to $i, got ${codes(0)}")
      assert(codes(3) == 0, s"constant dim must code to 0, got ${codes(3)}")
      val recon = r.getSeq[Float](2)
      val orig = r.getSeq[Float](3)
      (0 until 4).foreach { d =>
        assert(math.abs(recon(d).toDouble - orig(d).toDouble) <= idx.step(d) / 2 + 1e-9,
          s"vector $i dim $d: |${recon(d)} - ${orig(d)}| > step/2 = ${idx.step(d) / 2}")
      }
    }
    val unsigned = got.map(_.getSeq[Byte](1)(0) & 0xFF)
    assert(unsigned.min == 0 && unsigned.max == 255,
      "the dim-0 ramp must exercise every code incl. the sign-wrap region and 255")
  }

  test("sqScore equals the driver weight fold bit-for-bit on the real corpus") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val idx = Sq.train(spark, emb, "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lut = Sq.sqLut(idx, q)

    val rows = emb.select(col("vec_id"),
        Sq.encode(col("embedding"), idx).as("codes"),
        Sq.sqScore(Sq.encode(col("embedding"), idx), lut).as("score"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1).map(_ & 0xFF).toArray
      val expected = Sq.sqScoreOf(codes, lut)
      assert(r.getDouble(2) == expected,
        s"vec ${r.getLong(0)}: score ${r.getDouble(2)} != driver $expected")
    }
    assert(rows.flatMap(_.getSeq[Byte](1)).exists(b => (b & 0xFF) > 127),
      "expected codes above 127 on the real corpus")

    // and the score is genuinely the distance of the reconstruction:
    // |q - recon|^2 - |q|^2, up to fold rounding (the algebraic
    // expansion reassociates, so exact equality is not expected)
    val q2 = q.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
    val recon = emb.select(col("vec_id"),
        Sq.decode(Sq.encode(col("embedding"), idx), idx).as("recon")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val score = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    recon.foreach { case (id, rec) =>
      val exact = rec.zip(q).map { case (x, qq) =>
        (qq.toDouble - x.toDouble) * (qq.toDouble - x.toDouble)
      }.sum - q2
      assert(math.abs(score(id) - exact) <= 1e-6 * (math.abs(exact) + 1),
        s"vec $id: sq score ${score(id)} is not the reconstruction distance $exact")
    }
  }

  test("probe-all partitioned search == flat scan; append == fresh publish; guards hold") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val coarse = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 4)
    val idx = Sq.train(spark, emb, "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val n = emb.count().toInt

    val layout = java.nio.file.Files.createTempDirectory("ivfsq").toString + "/layout"
    Sq.writePartitionedSq(emb, "vec_id", "embedding", coarse, idx, layout)

    val flat = java.nio.file.Files.createTempDirectory("sqflat").toString + "/codes"
    Sq.writeCodes(emb, "vec_id", "embedding", idx, flat)
    val flatK = Sq.topKSq(spark, spark.read.parquet(flat), "vec_id", idx, q, k = n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val partK = Sq.topKPartitionedSq(spark, layout, "vec_id", coarse, idx, q,
        k = n, nprobe = coarse.nlist)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(partK.toSeq == flatK.toSeq,
      "probe-all partitioned search must equal the flat scan row-for-row")

    // frozen-geometry append == fresh publish of the union
    val base = emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") === 0L)
    val batch = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0L)
    val inc = java.nio.file.Files.createTempDirectory("ivfsq-inc").toString + "/layout"
    Sq.writePartitionedSq(base, "vec_id", "embedding", coarse, idx, inc)
    val drift = Sq.appendPartitionedSq(batch, "vec_id", "embedding", coarse, idx, inc)
    assert(drift.ratio > 0 && !drift.drifted(threshold = 3.0),
      s"same-distribution batch must not report drift, got ratio ${drift.ratio}")
    val incK = Sq.topKPartitionedSq(spark, inc, "vec_id", coarse, idx, q,
        k = n, nprobe = coarse.nlist)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(incK.toSeq == partK.toSeq,
      "append with frozen geometry must reproduce the fresh-publish results")

    // geometry guard: a retrained quantizer refuses the old layout
    val other = Sq.SqIndex(idx.lo.map(_ + 1f), idx.step)
    intercept[IllegalArgumentException] {
      Sq.topKPartitionedSq(spark, layout, "vec_id", coarse, other, q, 10, 2)
    }
    // tier guard: an IVF-PQ layout has no SQ sidecar — loud, not garbage
    val pq = graft.pipeline.Pq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 64)
    val pqLayout = java.nio.file.Files.createTempDirectory("ivfpq4sq").toString + "/layout"
    graft.pipeline.Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, pq, pqLayout)
    intercept[IllegalArgumentException] {
      Sq.topKPartitionedSq(spark, pqLayout, "vec_id", coarse, idx, q, 10, 2)
    }
  }

  test("streamed SQ batches surface exactly under the marker-keyed commit") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val base  = emb.filter(col("vec_id") % 4 =!= 0 || col("vec_id") === 0L)
    val batch = emb.filter(col("vec_id") % 4 === 0 && col("vec_id") =!= 0L)
    val coarse = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
    val idx = Sq.train(spark, base, "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    val layout = java.nio.file.Files.createTempDirectory("sq-stream").toString + "/layout"
    Sq.writePartitionedSq(base, "vec_id", "embedding", coarse, idx, layout)
    val srcDir = java.nio.file.Files.createTempDirectory("sq-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sq-stream-ckpt").toString
    batch.write.mode("append").parquet(srcDir)

    graft.streaming.AnnStream.appendEmbeddingsSq(spark, srcDir, emb.schema,
        "vec_id", "embedding", coarse, idx, layout, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(layout).count() == emb.count(),
      "every streamed vector appended once")
    // replay is a no-op
    assert(graft.streaming.AnnStream.appendBatchSq(batch, ckpt, 0L, "vec_id",
      "embedding", coarse, idx, layout).isEmpty)
    assert(spark.read.parquet(layout).count() == emb.count())

    // probe-all over the streamed layout == fresh publish of the union
    val fresh = java.nio.file.Files.createTempDirectory("sq-fresh").toString + "/layout"
    Sq.writePartitionedSq(emb, "vec_id", "embedding", coarse, idx, fresh)
    val n = emb.count().toInt
    val got = Sq.topKPartitionedSq(spark, layout, "vec_id", coarse, idx, q,
      k = n, nprobe = coarse.nlist).collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Sq.topKPartitionedSq(spark, fresh, "vec_id", coarse, idx, q,
      k = n, nprobe = coarse.nlist).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq,
      "streamed layout must score row-identically to a fresh publish of the union")
  }

  test("property: random corpora quantize within step/2 in range, clamp out of range") {
    import org.scalacheck.{Gen, rng}
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, rng.Seed(seed)).get
    // 3 deterministic corpora of 40 random dim-6 vectors each, value
    // magnitudes spanning 6 orders (tiny steps to coarse steps)
    val genVec = Gen.listOfN(6, Gen.chooseNum(-1e3f, 1e3f)
      .flatMap(x => Gen.oneOf(x, x * 1e-3f, x * 1e3f)))
    (1L to 3L).foreach { seed =>
      val vecs = sample(Gen.listOfN(40, genVec), seed)
      val df = spark.createDataFrame(vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) })
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val idx = Sq.train(spark, df, "embedding")
      val rows = df.select(col("embedding"),
          Sq.encode(col("embedding"), idx).as("codes"),
          Sq.decode(Sq.encode(col("embedding"), idx), idx).as("recon"))
        .collect()
      rows.foreach { r =>
        val v = r.getSeq[Float](0); val codes = r.getSeq[Byte](1).map(_ & 0xFF)
        val recon = r.getSeq[Float](2)
        (0 until 6).foreach { d =>
          assert(codes(d) >= 0 && codes(d) <= 255)
          // train saw the whole corpus, so every value is in range:
          // reconstruction within half a step (+ float rounding slack)
          assert(math.abs(recon(d).toDouble - v(d).toDouble) <=
            idx.step(d) / 2 + math.abs(v(d)) * 1e-6 + 1e-9,
            s"seed $seed dim $d: |${recon(d)} - ${v(d)}| > step/2 = ${idx.step(d) / 2}")
        }
      }
      // out-of-range values (an APPENDED batch beyond the trained
      // range) clamp to the endpoints instead of wrapping
      val out = spark.createDataFrame(Seq(
          (100L, Seq.fill(6)(Float.MaxValue / 2), ""),
          (101L, Seq.fill(6)(-Float.MaxValue / 2), "")))
        .toDF("vec_id", "embedding", "pad")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val oc = out.select(col("vec_id"), Sq.encode(col("embedding"), idx).as("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).map(_ & 0xFF)).toMap
      assert(oc(100L).forall(_ == 255) && oc(101L).forall(_ == 0),
        s"out-of-range must clamp: ${oc}")
    }
  }

  test("partitioned SQ probe reads exactly nprobe cell directories") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val coarse = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val idx = Sq.train(spark, emb, "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val layout = java.nio.file.Files.createTempDirectory("ivfsq-plan").toString + "/layout"
    Sq.writePartitionedSq(emb, "vec_id", "embedding", coarse, idx, layout)

    val plan = Sq.topKPartitionedSq(spark, layout, "vec_id", coarse, idx, q,
      k = 10, nprobe = 2).queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("ivfsq-plan")) => f
    }
    assert(scans.nonEmpty, "plan must read the published layout")
    assert(scans.map(_.selectedPartitions.partitionCount).sum == 2,
      "the probe filter must prune to exactly the 2 probed cell directories")
  }

  test("rerank at probe-all/full candidates is the brute-force cosine top-k") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val coarse = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 4)
    val idx = Sq.train(spark, emb, "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val n = emb.count().toInt

    val layout = java.nio.file.Files.createTempDirectory("ivfsq-rr").toString + "/layout"
    Sq.writePartitionedSq(emb, "vec_id", "embedding", coarse, idx, layout)

    val got = Sq.topKRerankPartitionedSq(spark, layout, emb, "vec_id", "embedding",
        coarse, idx, q, k = 10, candidates = n, nprobe = coarse.nlist,
        pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    graft.functions.CosineSim.register(spark)
    val brute = emb.filter(col("vec_id") =!= 0L)
      .withColumn("cos", round(graft.functions.CosineSim.col(col("embedding"),
        typedLit(q.toSeq)), 6))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == brute.toSeq,
      "full-candidate probe-all rerank must be the brute-force cosine top-k")
  }
}

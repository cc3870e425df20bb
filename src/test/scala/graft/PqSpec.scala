package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Pq, Similarity}

/** Product quantization: the identities the module's contract names.
  *
  *  - encode/decode ROUND-TRIP at ksub=256 on a corpus built so every
  *    code value 0..255 (incl. the sign-wrap region 128..255 and the
  *    former error case 255) provably occurs;
  *  - ADC == exact score of the reconstruction: the distributed
  *    adcScore equals the driver-side sum of the addressed LUT
  *    entries bit-for-bit (this is exactly the identity the signed
  *    TINYINT wrap silently broke for codes > 127);
  *  - rerank degenerates to brute force when candidates >= corpus.
  */
class PqSpec extends GraftSuite {

  /** 256 vectors of dim 8 (nsub=2, dsub=4) whose subvectors are
    * pairwise distinct: Lloyd init takes all 256 as entries, every
    * cluster holds exactly its own point (the nearest entry to
    * sample i IS entry i — any other entry j is |v_i - v_j|² > 0
    * farther), so training is a fixpoint and vector i must encode to
    * codes [i, i] at ANY iteration count.
    */
  private def syntheticCorpus = {
    val rows = (0 until 256).map { i =>
      (i.toLong, Seq(i.toFloat, 1f, 0f, 0f, 0f, i.toFloat, 2f, 0f))
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  test("encode/decode round-trips every code 0..255 at ksub=256") {
    Pq.register(spark)
    val df = syntheticCorpus
    val idx = Pq.train(spark, df, "vec_id", "embedding", nsub = 2, ksub = 256)
    assert(idx.ksub == 256 && idx.nsub == 2 && idx.dsub == 4)

    val got = df.select(col("vec_id"),
        Pq.encode(col("embedding"), idx).as("codes"),
        Pq.decode(Pq.encode(col("embedding"), idx), idx).as("recon"),
        col("embedding"))
      .collect()
    got.foreach { r =>
      val i = r.getLong(0).toInt
      val codes = r.getSeq[Byte](1).map(_ & 0xFF)
      assert(codes == Seq(i, i), s"vector $i must encode to its own entry, got $codes")
      assert(r.getSeq[Float](2) == r.getSeq[Float](3),
        s"decode(encode(v)) must reproduce vector $i exactly (each cluster holds one point)")
    }
    // the wrap region really ran: codes above 127 and the max code 255
    val unsignedMax = got.flatMap(_.getSeq[Byte](1)).map(_ & 0xFF).max
    assert(unsignedMax == 255, "code 255 must occur (the pre-fix error case)")

    // reconstruction error is exactly 0 on the fixpoint corpus
    val maxErr = df.select(
      Pq.reconError(col("embedding"), Pq.encode(col("embedding"), idx), idx).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(maxErr == 0.0)
  }

  test("ADC equals the exact score of the reconstruction, bit-for-bit, codes > 127 included") {
    Pq.register(spark)
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val idx = Pq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 256)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lut = Pq.adcLut(idx, q)

    val rows = emb.select(col("vec_id"),
        Pq.encode(col("embedding"), idx).as("codes"),
        Pq.adcScore(Pq.encode(col("embedding"), idx), lut).as("adc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1).map(_ & 0xFF)
      // the addressed LUT entries summed in adcScore's reduceLeft
      // order — i.e. the exact (|c|² - 2 q·c) score of the
      // reconstruction, grouped per subspace
      val expected = codes.zipWithIndex.map { case (c, s) => lut(s)(c) }.reduceLeft(_ + _)
      assert(r.getDouble(2) == expected,
        s"vec ${r.getLong(0)}: adc ${r.getDouble(2)} != driver $expected (codes $codes)")
    }
    // the real corpus exercises the wrap region too (256 entries, 500
    // training points per subspace: the high half of the codebook is
    // populated by init and keeps its points)
    assert(rows.flatMap(_.getSeq[Byte](1)).exists(b => (b & 0xFF) > 127),
      "expected codes above 127 on the real corpus")
  }

  test("residual coding refines plain coding; per-cell LUT dispatch scores exactly; kind guards hold") {
    Pq.register(spark)
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val coarse = graft.pipeline.Ivf.train(spark, emb, "vec_id", "embedding", nlist = 4)
    val plain = Pq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 64)
    val resid = Pq.trainResidual(spark, emb, "vec_id", "embedding", coarse, nsub = 8, ksub = 64)

    // the classic IVFADC claim, pinned on this corpus: residuals are
    // tighter than raw vectors, so the same byte budget reconstructs
    // them better (deterministic — training and data are fixed)
    val ePlain = Pq.meanReconError(emb, "embedding", plain)
    val eResid = Pq.meanReconError(emb, "embedding", resid, Some(coarse))
    assert(eResid < ePlain,
      s"residual coding must refine plain coding: $eResid !< $ePlain")

    val layout = java.nio.file.Files.createTempDirectory("ivfpq-res").toString + "/layout"
    Pq.writePartitionedPqResidual(emb, "vec_id", "embedding", coarse, resid, layout)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    // per-cell LUT dispatch: probing ALL cells with k = corpus, every
    // row's micro score must equal the driver-side sum of its own
    // cell's LUT entries over its stored codes
    val n = emb.count().toInt
    val got = Pq.topKPartitionedPqResidual(spark, layout, "vec_id", coarse, resid,
        q, k = n, nprobe = coarse.nlist)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val luts = coarse.centroids.indices.map { c =>
      c -> Pq.adcLut(resid, Array.tabulate(q.length)(i => q(i) - coarse.centroids(c)(i)))
    }.toMap
    val stored = spark.read.parquet(layout)
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1).map(_ & 0xFF), r.getInt(2)))
    assert(stored.nonEmpty)
    stored.foreach { case (id, codes, cell) =>
      val adc = codes.zipWithIndex.map { case (code, s) => luts(cell)(s)(code) }.reduceLeft(_ + _)
      val want = math.floor(adc * 1e6).toLong
      assert(got(id) == (want, cell),
        s"vec $id (cell $cell): got ${got(id)}, want ($want, $cell)")
    }

    // kind guards: a residual layout refuses the raw reader and a raw
    // layout refuses the residual reader — silent-garbage class
    intercept[IllegalArgumentException] {
      Pq.topKPartitionedPq(spark, layout, "vec_id", coarse, resid, q, 10, 2)
    }
    val rawLayout = java.nio.file.Files.createTempDirectory("ivfpq-raw").toString + "/layout"
    Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, plain, rawLayout)
    intercept[IllegalArgumentException] {
      Pq.topKPartitionedPqResidual(spark, rawLayout, "vec_id", coarse, plain, q, 10, 2)
    }
  }

  test("rerank with candidates >= corpus size is exactly the brute-force cosine top-k") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val idx = Pq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 256)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val corpus = emb.filter(col("vec_id") =!= 0L)
    val codesPath = java.nio.file.Files.createTempDirectory("pq-codes").toString + "/codes"
    Pq.writeCodes(corpus, "vec_id", "embedding", idx, codesPath)

    val n = corpus.count().toInt
    val got = Pq.topKRerank(spark, spark.read.parquet(codesPath), corpus,
        "vec_id", "embedding", idx, q, k = 10, candidates = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // same cosine implementation as topKRerank's exact leg, so the
    // comparison cannot diverge on accumulation order at a 0.5-ulp tie
    val exact = Similarity.topK(corpus, "vec_id", "embedding", q.toSeq, 10,
        graft.functions.CosineSim.col)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact, "full-candidate rerank must be the brute-force top-k")
  }

  test("partitioned ADC shortlist → exact rerank: pushed id filter, no shuffle, brute-force degeneration") {
    val emb = graft.sources.Tables(spark, sf001).embeddings
    val coarse = graft.pipeline.Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val idx = Pq.train(spark, emb, "vec_id", "embedding", nsub = 8, ksub = 64)
    val layout = java.nio.file.Files.createTempDirectory("ivfpq-rerank").toString + "/layout"
    Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, idx, layout)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Pq.topKRerankPartitionedPq(spark, layout, emb, "vec_id", "embedding",
        coarse, idx, q, k = 10, candidates = 20, nprobe = 2,
        pred = col("vec_id") =!= 0L)
      val plan = df.queryExecution.executedPlan

      // the raw-vector fetch-back: candidate ids reach the corpus scan
      // as a pushed parquet filter — only candidate row groups are read
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
      assert(pushed.contains("In(vec_id"),
        s"candidate ids must be pushed into the corpus scan, got: $pushed")
      // scan → exact score → TakeOrdered: no join, no shuffle anywhere
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "the fetch-back must not shuffle the corpus")
      assert(!plan.toString.contains("Join"), "the fetch-back is a pushed filter, not a join")

      // shortlisted ids are exactly the ADC shortlist's
      val sl = Pq.topKPartitionedPq(spark, layout, "vec_id", coarse, idx, q,
        k = 20, nprobe = 2, pred = col("vec_id") =!= 0L)
        .collect().map(_.getLong(0)).toSet
      val got = df.collect().map(_.getLong(0))
      assert(got.length == 10 && got.forall(sl.contains),
        "re-ranked rows must come from the ADC shortlist")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)

    // degeneration: probe-all + candidates >= corpus IS brute force
    val n = emb.count().toInt
    val full = Pq.topKRerankPartitionedPq(spark, layout, emb, "vec_id", "embedding",
        coarse, idx, q, k = 10, candidates = n, nprobe = coarse.nlist,
        pred = col("vec_id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.topK(emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding",
        q.toSeq, 10, graft.functions.CosineSim.col)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact, "probe-all full-candidate rerank must be the brute-force top-k")

    // and the residual twin composes the same way
    val rIdx = Pq.trainResidual(spark, emb, "vec_id", "embedding", coarse, nsub = 8, ksub = 64)
    val rLayout = java.nio.file.Files.createTempDirectory("ivfpq-rerank-res").toString + "/layout"
    Pq.writePartitionedPqResidual(emb, "vec_id", "embedding", coarse, rIdx, rLayout)
    val fullR = Pq.topKRerankPartitionedPq(spark, rLayout, emb, "vec_id", "embedding",
        coarse, rIdx, q, k = 10, candidates = n, nprobe = coarse.nlist,
        pred = col("vec_id") =!= 0L, residual = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fullR == exact, "residual probe-all full-candidate rerank must be brute force")
  }

  test("training sample floor scales with ksub (64 points per centroid, never below 4096)") {
    assert(Pq.defaultSampleRows(16) === 4096, "small codebooks keep the legacy floor")
    assert(Pq.defaultSampleRows(64) === 4096, "64*64 = 4096: the floors meet")
    assert(Pq.defaultSampleRows(256) === 16384, "ksub=256 trains on 64 points per centroid")
    // behavioral: on a corpus larger than the legacy 4096, the default
    // at ksub=128 now reads 64*128 = 8192 rows — same codebooks as the
    // explicit floor, different from an explicit legacy-4096 train
    import spark.implicits._
    val emb = (0 until 6000).map { i =>
      (i.toLong, Seq.tabulate(4)(d => (((i * 2654435761L + d * 40503L) % 1000) / 500f - 1f)))
    }.toDF("vec_id", "embedding")
    def books(sampleRows: Int) =
      Pq.train(spark, emb, "vec_id", "embedding", nsub = 2, ksub = 128,
        iters = 2, sampleRows = sampleRows).codebooks.map(_.map(_.toSeq).toSeq).toSeq
    val byDefault = Pq.train(spark, emb, "vec_id", "embedding", nsub = 2, ksub = 128,
      iters = 2).codebooks.map(_.map(_.toSeq).toSeq).toSeq
    assert(byDefault === books(8192), "default must equal the explicit 64*ksub floor")
    assert(byDefault !== books(4096), "the floor must actually widen the sample")
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the 4x middle rung of the compression
  * ladder: raw vectors (dim x 4 B) -> SQ8 (dim x 1 B) -> PQ
  * (nsub x 1 B). Each dimension is quantized independently with a
  * per-dim affine map `x ~ lo_d + code_d * step_d`, codes in 0..255 —
  * unlike [[Pq]] there is no codebook, so decode is exact arithmetic
  * and the approximate squared distance expands into per-dim weighted
  * sums of the code and its square:
  *
  *   |q - x^|^2 - |q|^2
  *     = SUM (lo_d^2 - 2 q_d lo_d)                 (bias, per query)
  *     + SUM 2 step_d (lo_d - q_d) * c_d           (w1 . codes)
  *     + SUM step_d^2 * c_d^2                      (w2 . codes^2)
  *
  * so scan-time scoring is one constant plus dim byte lookups — plain
  * arithmetic inside whole-stage codegen, no vector ops, 4x less I/O.
  * Loses less fidelity than PQ (recon error is at most step/2 per dim)
  * at 8x its footprint; the partitioned tier composes with the same
  * coarse-cell file pruning, tombstones, and staged-append machinery
  * as the PQ layouts.
  *
  * Reference anchor: the reference packs every typed property value
  * into fixed-width byte records behind `MMapHandle Word8`
  * (HGraphStorage Types.hs:291, binLength Types.hs:98) — SQ8 is that
  * byte-width value compression applied to embedding payloads. Public
  * knowledge: uniform scalar quantization as in faiss's
  * ScalarQuantizer (QT_8bit), Jégou et al. TPAMI'11 §II.
  */
object Sq {

  /** Per-dim affine map: `decode(c)_d = lo_d + c * step_d`. `lo` is
    * stored as FLOAT (the corpus element type); `step` in DOUBLE —
    * it is derived arithmetic, and keeping it double avoids a second
    * rounding in every encode/score.
    */
  final case class SqIndex(lo: Array[Float], step: Array[Double]) {
    def dim: Int = lo.length
  }

  /** Train = per-dim min/max over the corpus: ONE distributed
    * aggregate (2·dim partial-agg expressions, map-side combined, a
    * single tiny result row) — no sample needed, the exact range is
    * cheaper than Lloyd and outliers matter for clamping. At 100 TB
    * this is one full scan of the vector column at ingest cost.
    * Constant dims (max == min, or NaN-poisoned) get step = 1 so
    * every value encodes to code 0 instead of NaN.
    */
  def train(spark: SparkSession, emb: DataFrame, vecCol: String): SqIndex = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val aggs = (0 until dim).flatMap { d =>
      val x = element_at(col(vecCol), d + 1)
      Seq(min(x).as(s"lo$d"), max(x).as(s"hi$d"))
    }
    val row = emb.agg(aggs.head, aggs.tail: _*).head()
    val lo = Array.tabulate(dim)(d => row.getFloat(2 * d))
    val step = Array.tabulate(dim) { d =>
      val s = (row.getFloat(2 * d + 1).toDouble - lo(d).toDouble) / 255.0
      if (s > 0) s else 1.0
    }
    SqIndex(lo, step)
  }

  /** Codes column: `array<tinyint>` of length dim, each code the
    * clamped round of `(x_d - lo_d) / step_d` — floor(..+0.5), NOT
    * half-even, so a SQL oracle reproduces it with floor. Stored
    * two's-complement like [[Pq.encode]] (128..255 land as negative
    * bytes; readers mask with 255). Plan size is O(dim) expressions —
    * fine at embedding widths; parquet bit-packs the column to ~dim
    * bytes/row.
    */
  def encode(vec: Column, index: SqIndex): Column =
    array(Array.tabulate(index.dim) { d =>
      val x = element_at(vec, d + 1).cast("double")
      val c = least(greatest(
        floor((x - lit(index.lo(d).toDouble)) / lit(index.step(d)) + lit(0.5)),
        lit(0L)), lit(255L)).cast("int")
      (c - when(c > 127, 256).otherwise(0)).cast("byte")
    }.toIndexedSeq: _*)

  /** Unsigned read of dim `d`'s code — [[Pq]]'s codeAt convention. */
  private def codeAt(codes: Column, d: Int): Column =
    element_at(codes, d + 1).cast("int").bitwiseAND(lit(255))

  /** Reconstruction `lo_d + c_d * step_d`, back in FLOAT (the corpus
    * element type).
    */
  def decode(codes: Column, index: SqIndex): Column =
    array(Array.tabulate(index.dim) { d =>
      (lit(index.lo(d).toDouble) + codeAt(codes, d).cast("double") * lit(index.step(d)))
        .cast("float")
    }.toIndexedSeq: _*)

  /** Squared reconstruction error |v - decode(encode(v))|^2 — at most
    * dim * (step/2)^2 for in-range values; the drift yardstick for
    * appends, exactly [[Pq.reconError]]'s role.
    */
  def reconError(vec: Column, codes: Column, index: SqIndex): Column =
    aggregate(
      zip_with(vec, decode(codes, index),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, x) => a + x)

  /** Corpus-mean recon error (publish cost — one encode scan). The
    * codes land in their own projection first: inlining
    * `decode(encode(v))` substitutes the dim-element encode tree into
    * each of decode's dim lookups — a dim^2 expression blowup that
    * showed up as a 13 MiB task binary at dim 64 — and the alias
    * barrier keeps the tree linear (CollapseProject refuses to
    * duplicate non-cheap aliases referenced more than once).
    */
  def meanReconError(emb: DataFrame, vecCol: String, index: SqIndex): Double =
    emb.select(col(vecCol).as("v"), encode(col(vecCol), index).as("codes"))
      .select(reconError(col("v"), col("codes"), index).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)

  /** The per-query scoring weights (driver-side, O(dim)): approximate
    * squared distance minus |q|^2 decomposes as
    * `bias + SUM w1_d c_d + SUM w2_d c_d^2` (scaladoc above). All
    * accumulation left-to-right in doubles so an oracle can emit the
    * VALUES as exact literals.
    */
  final case class SqLut(bias: Double, w1: Array[Double], w2: Array[Double])

  def sqLut(index: SqIndex, query: Array[Float]): SqLut = {
    require(query.length == index.dim, s"query dim ${query.length} != index dim ${index.dim}")
    var bias = 0.0
    val w1 = new Array[Double](index.dim)
    val w2 = new Array[Double](index.dim)
    var d = 0
    while (d < index.dim) {
      val lo = index.lo(d).toDouble; val q = query(d).toDouble; val s = index.step(d)
      bias += lo * lo - 2.0 * q * lo
      w1(d) = 2.0 * s * (lo - q)
      w2(d) = s * s
      d += 1
    }
    SqLut(bias, w1, w2)
  }

  /** Scan-time SQ-ADC score: `bias + SUM_d (w1_d * c + w2_d * (c*c))`,
    * summed left-to-right over dims — dim codegen'd byte reads and
    * multiply-adds, no vector arithmetic. Equal BY CONSTRUCTION to
    * `|q - decode(codes)|^2 - |q|^2` up to the weight-fold rounding
    * (SqSpec pins the identity against a driver mirror).
    */
  def sqScore(codes: Column, lut: SqLut): Column =
    (lit(lut.bias) +: Array.tabulate(lut.w1.length) { d =>
      val c = codeAt(codes, d).cast("double")
      lit(lut.w1(d)) * c + lit(lut.w2(d)) * (c * c)
    }.toIndexedSeq).reduceLeft(_ + _)

  /** Integer-micro form (floor(score * 1e6)) — engine-stable gate
    * currency, [[Pq.adcMicros]]'s convention.
    */
  def sqMicros(codes: Column, lut: SqLut): Column =
    floor(sqScore(codes, lut) * lit(1e6)).cast("long")

  /** Driver mirror of [[sqScore]] over materialized codes — the spec
    * oracle (same fold order, bit-for-bit).
    */
  private[graft] def sqScoreOf(codes: Array[Int], lut: SqLut): Double = {
    var acc = lut.bias
    var d = 0
    while (d < codes.length) {
      val c = codes(d).toDouble
      acc = acc + (lut.w1(d) * c + lut.w2(d) * (c * c))
      d += 1
    }
    acc
  }

  /** Publish the flat codes table (id, codes) — the 4x-smaller scan
    * target.
    */
  def writeCodes(emb: DataFrame, idCol: String, vecCol: String,
      index: SqIndex, path: String): Unit =
    emb.select(col(idCol), encode(col(vecCol), index).as("codes"))
      .write.mode("overwrite").parquet(path)

  /** SQ-ADC top-k over a codes table: one pruned scan (id + dim bytes
    * per row), ascending (sq_micros, id).
    */
  def topKSq(spark: SparkSession, codes: DataFrame, idCol: String,
      index: SqIndex, query: Array[Float], k: Int,
      pred: Column = lit(true)): DataFrame = {
    val lut = sqLut(index, query)
    codes.filter(pred)
      .select(col(idCol), sqMicros(col("codes"), lut).as("sq_micros"))
      .orderBy(col("sq_micros").asc, col(idCol).asc)
      .limit(k)
  }

  // ---- IVF-SQ: coarse cells prune FILES, codes shrink BYTES 4x ----

  private def metaPath(path: String) = s"$path/_ivfsq_meta.properties"

  private def sqPrint(index: SqIndex): String =
    Pq.fingerprint(index.lo.iterator ++ index.step.iterator.map(_.toFloat))
  private def coarsePrint(coarse: Ivf.IvfIndex): String =
    Pq.fingerprint(coarse.centroids.iterator.flatten)

  /** Publish (id, codes) PARTITIONED BY coarse cell — exactly
    * [[Pq.writePartitionedPq]]'s layout with SQ codes: a probe lists
    * nprobe/nlist directories and reads dim bytes instead of dim
    * floats. The sidecar pins which geometry produced the codes
    * (kind=sq8 so PQ reads refuse it and vice versa) plus the
    * publish-time recon-error drift baseline.
    */
  def writePartitionedSq(emb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: SqIndex, path: String): Unit = {
    graft.functions.NearestCell.register(emb.sparkSession)
    emb.select(col(idCol), encode(col(vecCol), index).as("codes"),
        Ivf.assign(col(vecCol), coarse).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    graft.core.Sidecar.writeProps(metaPath(path),
      Seq("kind" -> "sq8", "coarse" -> coarsePrint(coarse), "sq" -> sqPrint(index),
        "mean_recon" -> meanReconError(emb, vecCol, index).toString))
  }

  private[pipeline] def checkSqLayout(path: String, coarse: Ivf.IvfIndex,
      index: SqIndex): Map[String, String] = {
    val mp = metaPath(path)
    val meta = graft.core.Sidecar.readPropsExpected(mp).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF-SQ metadata sidecar at $mp — publish with writePartitionedSq"))
    require(meta.get("kind").contains("sq8"),
      s"layout at $path is kind=${meta.getOrElse("kind", "?")}, not sq8 — scoring " +
        "another tier's codes with SQ weights is silent garbage")
    require(meta.get("coarse").contains(coarsePrint(coarse)) &&
        meta.get("sq").contains(sqPrint(index)),
      s"IVF-SQ index mismatch at $path: layout published with " +
        s"(coarse=${meta.getOrElse("coarse", "?")}, sq=${meta.getOrElse("sq", "?")}) " +
        s"but the read uses (coarse=${coarsePrint(coarse)}, sq=${sqPrint(index)}) — " +
        "republish after retraining instead of mixing geometries")
    meta
  }

  /** IVF-SQ search: probe-cell PARTITION filter (file pruning) + SQ
    * scoring, tombstone-aware — [[Pq.topKPartitionedPq]]'s mechanics
    * at 4x instead of 32x compression.
    */
  def topKPartitionedSq(spark: SparkSession, path: String, idCol: String,
      coarse: Ivf.IvfIndex, index: SqIndex, query: Array[Float], k: Int,
      nprobe: Int, pred: Column = lit(true)): DataFrame = {
    checkSqLayout(path, coarse, index)
    val probeCells = Ivf.probeOrder(coarse, query).take(nprobe)
    val lut = sqLut(index, query)
    Tombstones.applyTo(
      spark.read.parquet(path).filter(col("cell").isin(probeCells: _*) && pred),
      path, idCol)
      .select(col(idCol), sqMicros(col("codes"), lut).as("sq_micros"), col("cell"))
      .orderBy(col("sq_micros").asc, col(idCol).asc)
      .limit(k)
  }

  /** Drift-reported O(batch) append with the FROZEN geometry — codes
    * are deterministic in (coarse, index), so the appended layout is
    * row-identical to a fresh publish of base UNION batch (SqSpec pins
    * search-result equality). [[Pq.PqDrift]] is reused as the report:
    * rising recon error is the retrain trigger.
    */
  def appendPartitionedSq(newEmb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: SqIndex, path: String): Pq.PqDrift = {
    val meta = checkSqLayout(path, coarse, index)
    graft.functions.NearestCell.register(newEmb.sparkSession)
    newEmb.select(col(idCol), encode(col(vecCol), index).as("codes"),
        Ivf.assign(col(vecCol), coarse).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
    val batchMean = meanReconError(newEmb, vecCol, index)
    Pq.PqDrift(meta.get("mean_recon").map(_.toDouble).getOrElse(batchMean), batchMean)
  }

  /** Transactional half of [[appendPartitionedSq]]: stage the batch's
    * cell-partitioned code files invisibly; promoting them live is
    * [[graft.streaming.AnnStream]]'s marker-keyed exactly-once
    * protocol — the SQ leg of the same staged-commit story as
    * [[Pq.stagePartitionedPq]].
    */
  def stagePartitionedSq(newEmb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: SqIndex, layoutPath: String,
      stagingPath: String): Pq.PqDrift = {
    val meta = checkSqLayout(layoutPath, coarse, index)
    graft.functions.NearestCell.register(newEmb.sparkSession)
    newEmb.select(col(idCol), encode(col(vecCol), index).as("codes"),
        Ivf.assign(col(vecCol), coarse).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(stagingPath)
    val batchMean = meanReconError(newEmb, vecCol, index)
    Pq.PqDrift(meta.get("mean_recon").map(_.toDouble).getOrElse(batchMean), batchMean)
  }

  /** Production read path: probe-pruned SQ shortlist, then EXACT
    * cosine re-rank of only the shortlisted ids against the raw
    * corpus — [[Pq.topKRerankPartitionedPq]]'s shape (candidate ids
    * re-enter as a pushed literal IN filter; no join, no corpus
    * shuffle). SQ's tighter quantization means a given recall target
    * needs FEWER candidates than PQ — the tier to pick when the 4x
    * scan cost is affordable.
    */
  def topKRerankPartitionedSq(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String, coarse: Ivf.IvfIndex, index: SqIndex,
      query: Array[Float], k: Int, candidates: Int, nprobe: Int,
      pred: Column = lit(true)): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val shortlist = topKPartitionedSq(spark, path, idCol, coarse, index, query,
      candidates, nprobe, pred)
    val ids = shortlist.select(col(idCol)).collect().map(_.get(0)).toSeq
    Pq.rerankFetch(corpus, idCol, vecCol, ids, query, k)
  }

  // ---- batch kNN join over the SQ tier ----

  /** [[sqScore]] with the per-query weights read from a joined
    * `[bias, w1...]` column instead of literals — IDENTICAL fold
    * (bias first, then per-dim (w1·c) + (w2·(c·c)) left-to-right;
    * the query-independent w2 = step² stays a literal), and
    * [[graft.functions.SqWeights]] computes the weights with
    * [[sqLut]]'s exact arithmetic, so batch scores are bit-for-bit
    * the per-query scores (SqBatchSpec pins it).
    */
  private def sqScoreBatch(codes: Column, qw: Column, index: SqIndex): Column =
    (element_at(qw, 1) +: Array.tabulate(index.dim) { d =>
      val c = codeAt(codes, d).cast("double")
      element_at(qw, d + 2) * c + lit(index.step(d) * index.step(d)) * (c * c)
    }.toIndexedSeq).reduceLeft(_ + _)

  /** Batch SQ kNN JOIN — [[Pq.topKBatchAdc]]'s shape over the 4x
    * tier: every query's probe cells fan out via the codegen'd
    * [[graft.functions.NearestCells]], per-query weights ride the
    * broadcast side as ONE [[graft.functions.SqWeights]] column, the
    * pruned corpus joins on `cell` (codes never shuffle; the corpus
    * is read once through the probed-cell partition filter), and the
    * only shuffle ranks narrow (q_id, id, sq_micros) triples.
    */
  def topKBatchSq(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, coarse: Ivf.IvfIndex,
      index: SqIndex, k: Int, nprobe: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    graft.functions.NearestCells.register(spark)
    graft.functions.SqWeights.register(spark)
    val np = math.min(nprobe, coarse.nlist)
    val qcells = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"),
        explode(graft.functions.NearestCells.col(col(qVecCol), coarse.centroids, np))
          .as("cell"))
      .select(col("q_id"), col("cell"),
        graft.functions.SqWeights.col(col("q_vec"), index.lo, index.step).as("q_w"))
    val wanted = qcells.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val corpus = Tombstones.applyTo(
      spark.read.parquet(path).filter(col("cell").isin(wanted: _*)), path, idCol)
    val scored = corpus.join(broadcast(qcells), Seq("cell"))
      .filter(pairFilter)
      .select(col("q_id"), col(idCol),
        floor(sqScoreBatch(col("codes"), col("q_w"), index) * lit(1e6))
          .cast("long").as("sq_micros"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sq_micros").asc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** [[topKBatchSq]] for query sets above the broadcast budget:
    * hash-slab the queries, one batch join per slab, unionAll —
    * [[Pq.topKBatchAdcSlabbed]]'s mechanics (each slab keeps the
    * single-batch plan; SqBatchSpec pins slabs ≡ 1).
    */
  def topKBatchSqSlabbed(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, coarse: Ivf.IvfIndex,
      index: SqIndex, k: Int, nprobe: Int, slabs: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    require(slabs >= 1, s"slabs must be >= 1, got $slabs")
    (0 until slabs).map { s =>
      topKBatchSq(spark, path,
        queries.filter(pmod(hash(col(qIdCol)), lit(slabs)) === s),
        qIdCol, qVecCol, idCol, coarse, index, k, nprobe, pairFilter)
    }.reduce(_.unionAll(_))
  }

  /** Batch shortlist + EXACT re-rank over the SQ tier —
    * [[Pq.topKBatchAdcRerank]]'s shape: (q_id, id) shortlist pairs
    * broadcast, corpus scanned once through the broadcast join, the
    * only shuffle ranks narrow cosine triples.
    */
  def topKBatchSqRerank(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String, idCol: String,
      vecCol: String, coarse: Ivf.IvfIndex, index: SqIndex, k: Int,
      candidates: Int, nprobe: Int, pairFilter: Column = lit(true)): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val sl = topKBatchSq(spark, path, queries, qIdCol, qVecCol, idCol,
      coarse, index, candidates, nprobe, pairFilter)
      .select(col("q_id"), col(idCol))
    val qvecs = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    val scored = corpus.join(broadcast(sl), Seq(idCol))
      .join(broadcast(qvecs), Seq("q_id"))
      .select(col("q_id"), col(idCol),
        round(graft.functions.CosineSim.col(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Recall-driven (nprobe, candidates) tuning for the SQ tier —
    * [[Pq.tuneAdcRerank]]'s grid harness over [[topKBatchSqRerank]].
    * SQ's tighter quantization typically meets a recall target at
    * FEWER candidates than PQ at the same nprobe; measure both tiers
    * with their tuners and pick by (recall, scan bytes).
    */
  def tuneSqRerank(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String, idCol: String,
      vecCol: String, coarse: Ivf.IvfIndex, index: SqIndex, k: Int,
      targetRecall: Double, maxCandidates: Int = 1 << 12,
      pairFilter: Column = lit(true)): Pq.AdcTuning =
    Pq.tuneShortlistRerank(spark, corpus, queries, qIdCol, qVecCol, idCol,
      vecCol, k, targetRecall, maxCandidates, pairFilter, coarse.nlist) { (np, cand) =>
      topKBatchSqRerank(spark, path, corpus, queries, qIdCol, qVecCol, idCol,
        vecCol, coarse, index, k, cand, np, pairFilter)
    }
}

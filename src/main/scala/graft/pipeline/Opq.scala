package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MatVec

/** Optimized Product Quantization (OPQ — Ge, He, Ke, Sun, CVPR 2013;
  * public knowledge): learn an ORTHONORMAL rotation R and apply PQ to
  * R·v instead of v. Plain PQ quantizes fixed coordinate slices, so
  * correlated/unbalanced dimensions waste codebook budget; the
  * rotation redistributes variance across the subspaces and provably
  * lowers quantization error on the training sample (the alternation
  * below is coordinate descent on one objective). Same 8-byte codes,
  * same ADC scan shape — strictly better reconstruction at identical
  * (nsub, ksub) (OpqSpec pins the inequality on the gate corpus).
  *
  * Training is the standard non-parametric alternation, entirely
  * driver-side over [[Pq.train]]'s bounded deterministic sample:
  *
  *  1. fix R, train per-subspace codebooks on the rotated sample
  *     ([[Pq.trainOn]] — Lloyd, the exact arithmetic the distributed
  *     encode reproduces);
  *  2. fix the codebooks, solve the orthogonal Procrustes problem
  *     min_R ||X·Rᵀ − X̂||_F: R comes from the SVD of XᵀX̂ (d×d —
  *     KB-sized; breeze, which ships with Spark).
  *
  * The returned rotation is FLOAT and is applied by [[MatVec]] — one
  * codegen'd literal-matrix expression whose double-accumulate /
  * float-round order the driver-side training mirrors bit-for-bit, so
  * driver-trained codebooks and distributed encodes agree exactly
  * (the [[graft.functions.NearestCell]] discipline).
  *
  * Scale shape: identical to [[Pq]] — the rotation adds one O(dim²)
  * codegen'd step per encoded row (dim 64: 4096 fused
  * multiply-adds, trivially inside whole-stage codegen) and NOTHING to
  * the read path: codes tables, ADC LUTs built from the rotated query,
  * and every [[Pq]] search entry work unchanged on OPQ codes.
  */
object Opq {

  /** `rotation(i)(j)` = row i of the orthonormal map y = R·v. */
  final case class OpqIndex(rotation: Array[Array[Float]], pq: Pq.PqIndex) {
    def dim: Int = rotation.length
  }

  def register(spark: SparkSession): Unit = {
    MatVec.register(spark)
    Pq.register(spark)
  }

  /** Rotated-vector column `R·v` — the encode-side rotation step. */
  def rotate(vec: Column, rotation: Array[Array[Float]]): Column =
    MatVec.col(vec, rotation)

  /** Driver-side rotation with [[MatVec]]'s exact arithmetic: double
    * accumulation over j ascending, float-rounded elements (OpqSpec
    * pins the column form against this bit-for-bit).
    */
  private[graft] def rotateDriver(rotation: Array[Array[Float]],
      v: Array[Float]): Array[Float] =
    Array.tabulate(rotation.length) { i =>
      val row = rotation(i)
      var acc = 0.0
      var j = 0
      val n = math.min(row.length, v.length)
      while (j < n) { acc += row(j).toDouble * v(j).toDouble; j += 1 }
      acc.toFloat
    }

  /** OPQ alternation over the bounded sample, run from TWO
    * deterministic starting rotations — the identity and the paper's
    * parametric eigen-allocation init ([[eigenInit]]: principal
    * directions dealt across subspaces so each gets a balanced share
    * of the variance — the closed-form optimum for Gaussian data,
    * and the escape hatch from the permutation-shaped local optima
    * plain Procrustes alternation cannot cross). `opqIters` counts
    * (codebook retrain, Procrustes update) rounds per start; the best
    * (rotation, codebooks) pair BY MEASURED SAMPLE ERROR is returned,
    * so the result can never be worse than plain PQ (the identity
    * start's iteration 0 IS [[Pq.train]]'s index).
    */
  def train(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      nsub: Int, ksub: Int, iters: Int = 4, opqIters: Int = 6,
      sampleRows: Int = -1): OpqIndex = {
    // default scales with the codebook (Pq.defaultSampleRows): 64
    // points per centroid, never below the legacy 4096
    val rows = if (sampleRows > 0) sampleRows else Pq.defaultSampleRows(ksub)
    val sample = emb.orderBy(col(idCol)).limit(rows)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot train OPQ on an empty corpus")
    val d = sample(0).length
    require(d % nsub == 0, s"dim $d not divisible by nsub $nsub")

    var best: Option[(Double, Array[Array[Float]], Pq.PqIndex)] = None
    Seq(identity(d), eigenInit(sample, nsub)).foreach { r0 =>
      var rot = r0
      var it = 0
      while (it < math.max(opqIters, 1)) {
        val y = sample.map(rotateDriver(rot, _))
        val pq = Pq.trainOn(y, nsub, ksub, iters)
        val yhat = y.map(reconstructDriver(pq, _))
        val err = meanSq(y, yhat)
        if (best.forall(_._1 > err)) best = Some((err, rot, pq))
        rot = procrustes(sample, yhat)
        it += 1
      }
    }
    val (_, r, pq) = best.get
    OpqIndex(r, pq)
  }

  private def identity(d: Int): Array[Array[Float]] =
    Array.tabulate(d)(i => Array.tabulate(d)(j => if (i == j) 1f else 0f))

  /** Parametric OPQ init (Ge et al. §4): eigen-decompose the sample
    * covariance and deal principal directions across the nsub
    * subspaces greedily, largest eigenvalue to the subspace with the
    * smallest variance budget so far — balanced information per
    * subspace. Rows of the returned rotation are the reordered
    * eigenvectors (orthonormal by symmetry of the covariance).
    */
  private def eigenInit(sample: Array[Array[Float]], nsub: Int): Array[Array[Float]] = {
    val d = sample(0).length
    val dsub = d / nsub
    val n = sample.length
    val mean = new Array[Double](d)
    sample.foreach { v => var j = 0; while (j < d) { mean(j) += v(j); j += 1 } }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    sample.foreach { v =>
      var i = 0
      while (i < d) {
        val xi = v(i) - mean(i)
        var k = i
        while (k < d) { cov(i, k) += xi * (v(k) - mean(k)); cov(k, i) = cov(i, k); k += 1 }
        i += 1
      }
    }
    cov :/= n.toDouble
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues; deal descending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val budget = new Array[Double](nsub)
    val slots  = new Array[Int](nsub)
    val rows   = Array.fill(nsub)(scala.collection.mutable.ArrayBuffer.empty[Int])
    order.foreach { e =>
      val s = (0 until nsub).filter(slots(_) < dsub).minBy(budget(_))
      budget(s) += math.log1p(math.max(es.eigenvalues(e), 0.0))
      slots(s) += 1
      rows(s) += e
    }
    val rot = Array.ofDim[Float](d, d)
    var r = 0
    (0 until nsub).foreach { s =>
      rows(s).foreach { e =>
        var c = 0
        while (c < d) { rot(r)(c) = es.eigenvectors(c, e).toFloat; c += 1 }
        r += 1
      }
    }
    rot
  }

  /** Decode(encode(y)) with the driver-side [[Pq.nearest]] argmin —
    * the exact reconstruction the distributed path produces.
    */
  private def reconstructDriver(pq: Pq.PqIndex, y: Array[Float]): Array[Float] = {
    val out = new Array[Float](pq.dim)
    var s = 0
    while (s < pq.nsub) {
      val slice = java.util.Arrays.copyOfRange(y, s * pq.dsub, (s + 1) * pq.dsub)
      val c = Pq.nearest(pq.codebooks(s), slice)
      System.arraycopy(pq.codebooks(s)(c), 0, out, s * pq.dsub, pq.dsub)
      s += 1
    }
    out
  }

  private def meanSq(a: Array[Array[Float]], b: Array[Array[Float]]): Double = {
    var sum = 0.0
    var n = 0
    while (n < a.length) {
      var j = 0
      while (j < a(n).length) {
        val dd = a(n)(j).toDouble - b(n)(j).toDouble
        sum += dd * dd
        j += 1
      }
      n += 1
    }
    sum / math.max(a.length, 1)
  }

  /** Orthogonal Procrustes step: the R minimizing ||X·Rᵀ − X̂||_F is
    * U·Vᵀ from the SVD of XᵀX̂ (Schönemann 1966 — public textbook
    * material). d×d in doubles on the driver; returned float-rounded
    * (the precision the distributed rotation applies anyway).
    */
  private def procrustes(x: Array[Array[Float]],
      xhat: Array[Array[Float]]): Array[Array[Float]] = {
    val d = x(0).length
    val m = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var n = 0
    while (n < x.length) {
      var i = 0
      while (i < d) {
        val xi = x(n)(i).toDouble
        if (xi != 0.0) {
          var j = 0
          while (j < d) { m(i, j) += xi * xhat(n)(j).toDouble; j += 1 }
        }
        i += 1
      }
      n += 1
    }
    val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(m)
    val r = u * vt
    // y = R·v rows: R(i, j) maps input j to output i — r solves for
    // the row-vector form (y' = x'·Rᵀ), so transpose back
    Array.tabulate(d)(i => Array.tabulate(d)(j => r(j, i).toFloat))
  }

  /** Codes of the ROTATED vector — drop-in for [[Pq.encode]]; the
    * resulting codes table works with every [[Pq]] read path given a
    * rotated-query LUT ([[adcLut]]).
    */
  def encode(vec: Column, index: OpqIndex): Column =
    Pq.encode(rotate(vec, index.rotation), index.pq)

  /** ADC LUT for `query` against OPQ codes: [[Pq.adcLut]] of the
    * ROTATED query (rotation is orthonormal, so rotated-space ADC
    * distances ARE original-space distances up to float rounding).
    */
  def adcLut(index: OpqIndex, query: Array[Float]): Array[Array[Double]] =
    Pq.adcLut(index.pq, rotateDriver(index.rotation, query))

  /** Publish the OPQ codes table — [[Pq.writeCodes]] with the rotation
    * fused into the same single encode scan.
    */
  def writeCodes(emb: DataFrame, idCol: String, vecCol: String,
      index: OpqIndex, path: String): Unit = {
    register(emb.sparkSession)
    emb.select(col(idCol), encode(col(vecCol), index).as("codes"))
      .write.mode("overwrite").parquet(path)
  }

  /** ADC top-k over an OPQ codes table: [[Pq.topKAdc]] with the
    * rotated-query LUT.
    */
  def topKAdc(spark: SparkSession, codes: DataFrame, idCol: String,
      index: OpqIndex, query: Array[Float], k: Int,
      pred: Column = lit(true)): DataFrame = {
    register(spark)
    val lut = adcLut(index, query)
    codes.filter(pred)
      .select(col(idCol), Pq.adcMicros(col("codes"), lut).as("adc_micros"))
      .orderBy(col("adc_micros").asc, col(idCol).asc)
      .limit(k)
  }

  // ---- OPQ in the partitioned IVF tier: rotate ONCE, then delegate —
  // the FAISS `OPQd,IVFn,PQm` chain shape (public knowledge). The
  // rotation is orthonormal, so euclidean/cosine structure is
  // preserved: coarse centroids trained on R·v probe exactly as well
  // as raw-space centroids, and every Pq read path works unchanged
  // provided the query is rotated to match. The layout sidecar
  // records the rotation fingerprint; [[Pq]]'s plain entry points
  // REFUSE such layouts (unrotated-query LUTs over rotated-space
  // codes score silent garbage — same guard class as residual/plain).

  private[pipeline] def rotPrint(rotation: Array[Array[Float]]): String =
    Pq.fingerprint(rotation.iterator.flatten)

  /** `emb` with `vecCol` replaced by its rotation R·v (other columns
    * untouched) — the one fused codegen'd step that moves a frame
    * into the rotated space the whole compressed tier then operates
    * in. Applied at publish, append, and (for batch search) to the
    * query set; single-query reads rotate driver-side instead.
    */
  def rotatedFrame(emb: DataFrame, vecCol: String, index: OpqIndex): DataFrame = {
    register(emb.sparkSession)
    emb.withColumn(vecCol, rotate(col(vecCol), index.rotation))
  }

  /** Coarse quantizer trained in the ROTATED space. Distances are
    * rotation-invariant, so recall characteristics match a raw-space
    * coarse index; the centroids themselves live in R·v coordinates
    * and every read rotates its query before probing.
    */
  def trainCoarse(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, index: OpqIndex, nlist: Int, iters: Int = 2,
      maxTrainRows: Long = 1L << 20): Ivf.IvfIndex =
    Ivf.train(spark, rotatedFrame(emb, vecCol, index), idCol, vecCol,
      nlist, iters, maxTrainRows)

  /** Publish the OPQ-rotated cell-partitioned codes layout —
    * [[Pq.writePartitionedPq]] of the rotated frame (rotation fused
    * into the same single encode scan), with the rotation fingerprint
    * recorded in the sidecar so mismatched reads fail loud. `coarse`
    * must be rotated-space ([[trainCoarse]]).
    */
  def writePartitionedOpq(emb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: OpqIndex, path: String): Unit =
    Pq.writePartitionedPq(rotatedFrame(emb, vecCol, index), idCol, vecCol,
      coarse, index.pq, path, extraMeta = Seq("rot" -> rotPrint(index.rotation)))

  /** IVF-PQ search over an OPQ layout: rotate the query driver-side
    * ([[MatVec]]'s exact arithmetic), then [[Pq.topKPartitionedPq]]'s
    * mechanics verbatim — probe-cell partition pruning, 8-byte ADC,
    * tombstone masking all compose with the rotation for free.
    */
  def topKPartitionedOpq(spark: SparkSession, path: String, idCol: String,
      coarse: Ivf.IvfIndex, index: OpqIndex, query: Array[Float], k: Int,
      nprobe: Int, pred: Column = lit(true)): DataFrame =
    Pq.topKPartitionedPqChecked(spark, path, idCol, coarse, index.pq,
      rotateDriver(index.rotation, query), k, nprobe, pred,
      rot = Some(rotPrint(index.rotation)))

  /** O(batch) incremental append into an OPQ layout: rotate + encode
    * the batch with the FROZEN rotation/codebooks —
    * [[Pq.appendPartitionedPq]]'s drift contract, measured in the
    * rotated space (directly comparable to the publish-time
    * `mean_recon`, which is rotated too).
    */
  def appendPartitionedOpq(newEmb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: OpqIndex, path: String): Pq.PqDrift =
    Pq.appendPartitionedPqChecked(rotatedFrame(newEmb, vecCol, index), idCol,
      vecCol, coarse, index.pq, path, residual = false,
      rot = Some(rotPrint(index.rotation)))

  /** Batch ADC kNN join over an OPQ layout: the query set rotates
    * through ONE [[MatVec]] node (queries are DATA — rotation happens
    * where the per-row LUTs are built), then [[Pq.topKBatchAdc]]'s
    * exact mechanics: per-query [[graft.functions.PqLut]] LUTs, union
    * of probed cell directories, narrow-triple rank shuffle. Codes
    * and LUTs never shuffle; above broadcast budget, slab the query
    * set exactly like [[Pq.topKBatchAdcSlabbed]] (one call per slab).
    */
  def topKBatchAdcOpq(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, coarse: Ivf.IvfIndex,
      index: OpqIndex, k: Int, nprobe: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    Pq.checkPqLayout(path, coarse, index.pq, residual = false,
      rot = Some(rotPrint(index.rotation)))
    Pq.batchAdc(spark, path, rotatedFrame(queries, qVecCol, index), qIdCol,
      qVecCol, idCol, coarse, index.pq, k, nprobe, pairFilter,
      residual = false)
  }

  /** Production read path over an OPQ layout: probe-pruned rotated-
    * space ADC shortlist, then EXACT cosine re-rank of only the
    * shortlisted ids against the RAW corpus (cosine is rotation-
    * invariant — the fetch-back never touches the rotation; the ids
    * push into the corpus scan as a literal IN filter, zero shuffles).
    */
  def topKRerankPartitionedOpq(spark: SparkSession, path: String,
      corpus: DataFrame, idCol: String, vecCol: String, coarse: Ivf.IvfIndex,
      index: OpqIndex, query: Array[Float], k: Int, candidates: Int,
      nprobe: Int, pred: Column = lit(true)): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val shortlist = topKPartitionedOpq(spark, path, idCol, coarse, index,
      query, candidates, nprobe, pred)
    val ids = shortlist.select(col(idCol)).collect().map(_.get(0)).toSeq
    Pq.rerankFetch(corpus, idCol, vecCol, ids, query, k)
  }

  /** Mean squared reconstruction error in the ROTATED space — directly
    * comparable to [[Pq.meanReconError]] on the raw vectors: the
    * rotation is orthonormal, so ||R·v − ŷ||² equals the original-space
    * error of the un-rotated reconstruction Rᵀ·ŷ (up to float
    * rounding). This is the number OpqSpec pins strictly below plain
    * PQ's at identical (nsub, ksub).
    */
  def meanReconError(emb: DataFrame, vecCol: String, index: OpqIndex): Double = {
    register(emb.sparkSession)
    val y = rotate(col(vecCol), index.rotation)
    emb.select(Pq.reconError(y, Pq.encode(y, index.pq), index.pq).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
  }
}

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
      sampleRows: Int = 4096): OpqIndex = {
    val sample = emb.orderBy(col(idCol)).limit(sampleRows)
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

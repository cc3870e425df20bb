package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MatVec

/** PCA dimensionality reduction for embedding columns — the standard
  * prep step before ANN indexing (project 64-dim vectors to 8–16 dims,
  * then brute-force/IVF in the cheap space; Jégou et al. TPAMI'11 §VII
  * pair exactly this with PQ).
  *
  * Training computes EXACT second moments distributively: the
  * upper-triangle outer products explode from each row as a generated
  * array (no join, no window) and fold through ONE map-side-combinable
  * groupBy whose shuffle is bounded by d(d+1)/2 rows per partition —
  * never by the corpus. Input is capped to a deterministic id-hash
  * sample (the [[Ivf.train]] contract) so driver eigendecomposition
  * sees a d×d matrix regardless of corpus size; breeze `eigSym` (ships
  * with Spark) runs on the d×d covariance in microseconds.
  *
  * Projection applies as `MatVec(center(v))` — ONE codegen'd
  * expression over a float-subtracted centered vector, so plan size is
  * O(1) in d and [[driverProject]] reproduces every float bit (double
  * accumulation left-to-right, one float rounding per output dim; the
  * [[Opq]] arithmetic contract).
  *
  * Determinism: eigenvector signs are canonicalized (the largest-
  * magnitude component is made positive, ties to the lowest index) so
  * retraining on the same data yields the same matrix.
  */
object Pca {

  /** mean is FLOAT (centering subtracts in float, mirrored by the
    * oracle); projection rows are the top-dOut eigenvectors;
    * eigenvalues are ALL d of them, descending (variance accounting).
    */
  final case class PcaModel(mean: Array[Float], projection: Array[Array[Float]],
      eigenvalues: Array[Double]) {
    def dOut: Int = projection.length
    def dIn: Int = mean.length
    /** Fraction of total variance captured by the dOut kept dims. */
    def varianceExplained: Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(dOut).sum / tot
    }
  }

  /** Exact moments → covariance → eigendecomposition. One count + two
    * bounded aggregations over the sample; everything else is driver
    * d×d work.
    */
  def train(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      dOut: Int, maxTrainRows: Long = 1L << 20): PcaModel = {
    MatVec.register(spark) // [[project]] resolves mat_vec by name
    val nAll = emb.count()
    require(nAll > 1, s"PCA needs >= 2 rows, got $nAll")
    val every = math.max(1L, nAll / math.max(maxTrainRows, 1))
    val sample =
      if (every == 1) emb
      else emb.filter(pmod(hash(col(idCol)), lit(every)) === 0)

    val d = emb.select(size(col(vecCol))).head().getInt(0)
    require(dOut >= 1 && dOut <= d, s"dOut=$dOut out of range for dim $d")
    val v = col(vecCol)

    // spread (r16): the d(d+1)/2-per-row outer-product explode is the
    // train CPU and otherwise runs at the scan's parallelism (one
    // task on a single-row-group sample). Partial sums move from one
    // partition to `cores`, which is within the operator's existing
    // determinism contract (moments were already partition-ordered
    // double sums; the gate renders the trained matrix as literals).
    val sp = TextOps.spread(sample, col(idCol))

    // first moments: one (pos, sum, count) row per dimension
    val firsts = sp
      .select(posexplode(v).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
      .collect()
    // ragged corpora fail LOUDLY: every dimension must be present in
    // every sampled row, or the moments below silently mix row counts
    // and produce a wrong covariance
    require(firsts.length == d,
      s"ragged embeddings: saw ${firsts.length} distinct positions, first row had $d")
    val counts = firsts.map(_.getLong(2)).distinct
    require(counts.length == 1,
      s"ragged embeddings: per-dimension counts differ (${counts.sorted.mkString(", ")})")
    val n = counts.head
    require(n > 1, s"PCA sample needs >= 2 rows, got $n")
    val mean = new Array[Double](d)
    firsts.foreach(r => mean(r.getInt(0)) = r.getDouble(1) / n)

    // second moments: upper-triangle products explode per row, fold
    // through one groupBy — d(d+1)/2 result rows total
    val pairs = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(v, i + 1).cast("double") * element_at(v, j + 1).cast("double")).as("xy")))))
    val seconds = sp
      .select(explode(pairs).as("p"))
      .groupBy(col("p.i"), col("p.j"))
      .agg(sum(col("p.xy")).as("sxy"))
      .collect()

    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    seconds.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = r.getDouble(2) / n - mean(i) * mean(j)
      cov(i, j) = c; cov(j, i) = c
    }
    val es = breeze.linalg.eigSym(cov)
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val rows = order.take(dOut).map { e =>
      val row = Array.tabulate(d)(c => es.eigenvectors(c, e))
      // sign canon: largest-|x| component positive, ties lowest index
      val jmax = row.indices.maxBy(j => (math.abs(row(j)), -j))
      val flip = if (row(jmax) < 0) -1.0 else 1.0
      row.map(x => (x * flip).toFloat)
    }.toArray
    PcaModel(mean.map(_.toFloat), rows, order.map(es.eigenvalues(_)).toArray)
  }

  /** Centered projection as one codegen'd pipeline: float subtract,
    * then the MatVec literal-matrix product.
    */
  def project(vec: Column, model: PcaModel): Column =
    MatVec.col(zip_with(vec, typedlit(model.mean.toSeq), (x, m) => x - m),
      model.projection)

  /** Driver mirror of [[project]]: bit-identical floats. */
  def driverProject(model: PcaModel, v: Array[Float]): Array[Float] = {
    val c = Array.tabulate(model.dIn)(j => v(j) - model.mean(j))
    model.projection.map { row =>
      var acc = 0.0
      var j = 0
      while (j < c.length) { acc += row(j).toDouble * c(j).toDouble; j += 1 }
      acc.toFloat
    }
  }

  /** Publish the cell-partitioned ANN layout in the REDUCED space:
    * project the corpus, train coarse cells on the projections, write
    * `(idCol, vecCol=projected, cell=N/)`. The full tier composition —
    * file pruning × an 8× cheaper scan payload — with the standard
    * lifecycle (tombstones, appends via [[Ivf.appendPartitioned]] on
    * the projected batch) riding along for free.
    */
  def writePartitionedPca(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, model: PcaModel, nlist: Int, path: String): Ivf.IvfIndex = {
    val projected = emb.select(col(idCol), project(col(vecCol), model).as(vecCol))
    val coarse = Ivf.train(spark, projected, idCol, vecCol, nlist)
    Ivf.writePartitioned(projected, vecCol, coarse, path)
    coarse
  }

  /** The production PCA-tier read path: probe-pruned cosine shortlist
    * in the reduced space (reads nprobe/nlist of the files, 8 floats
    * per row), then exact cosine re-rank of ONLY the shortlisted ids
    * against the raw corpus (pushed `In` filter — the
    * [[Pq.topKRerankPartitionedPq]] shape at the cheapest tier).
    */
  def topKRerankPartitionedPca(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String, model: PcaModel, coarse: Ivf.IvfIndex,
      query: Array[Float], k: Int, candidates: Int, nprobe: Int,
      pred: Column = lit(true)): DataFrame = {
    val q = driverProject(model, query)
    val shortlist = Ivf.topKPartitioned(spark, path, idCol, vecCol, coarse, q,
      candidates, nprobe, pred)
    val ids = shortlist.select(col(idCol)).collect().map(_.get(0)).toSeq
    Pq.rerankFetch(corpus, idCol, vecCol, ids, query, k)
  }
}

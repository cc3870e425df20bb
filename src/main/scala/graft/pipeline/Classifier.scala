package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality/language classifier — the "model-based filtering"
  * step of a pretraining pipeline (GPT-3's quality classifier,
  * CCNet's fasttext gate): logistic regression over scan-speed text
  * features, trained by distributed batch gradient descent and
  * applied as ONE arithmetic expression per document.
  *
  * Training cost model: the (bounded, id-hash-sampled) feature frame
  * is persisted once; each of the `iters` steps is ONE aggregation
  * producing d+1 gradient sums + the loss — no per-row state, no
  * shuffle beyond the partial-agg tree. d is tiny (lexicon ratios +
  * length stats), so the driver update is microseconds. Gradient sums
  * are double adds across partitions, so trained weights are
  * deterministic only per partitioning — the GATE stays exact anyway
  * because scoring renders the trained weights as literals and the
  * oracle replays the same IEEE arithmetic.
  *
  * Scoring deliberately exposes the LINEAR score z (and micro-int
  * form): z is plain left-to-right double arithmetic — exactly
  * reproducible in SQL — where sigmoid(z) would hang cross-engine
  * equality on `exp` ulp agreement. The sigmoid is monotone, so
  * thresholding and ranking need only z.
  */
object Classifier {

  /** Language/quality features, all exactly reproducible in SQL:
    * per-lexicon hit ratios + mean word length (4 dp).
    */
  def langFeatures(text: Column): Seq[(String, Column)] = {
    val ts = TextOps.tokens(text)
    val n = size(ts)
    TextOps.lexicons.map { case (lang, lex) =>
      s"r_$lang" ->
        (TextOps.lexiconHits(text, lex).cast("double") / n.cast("double"))
    } :+ ("mean_word_len" ->
      round((length(text) - (n - 1)).cast("double") / n.cast("double"), 4))
  }

  /** Trained model: z = bias + Σ w_j · (x_j − mean_j)/std_j. `losses`
    * is the per-iteration mean log-loss (spec: non-increasing tail).
    */
  final case class Model(bias: Double, weights: Array[Double],
      mean: Array[Double], std: Array[Double], losses: Seq[Double])

  /** IRLS / Newton (what R's `glm` runs): the cluster computes the
    * (bounded, id-hash-sampled) feature frame and its exact
    * standardization moments; the Newton loop itself runs on the
    * DRIVER over the collected sample (r16 optimization). The r15
    * form aggregated the Hessian/gradient/loss through Catalyst every
    * iteration — correct, but each of the ~25 iterations re-planned
    * and re-compiled a fresh 36-expression aggregate (its literals
    * change per step), measured ~190 ms of pure driver
    * planning/codegen per iteration against sub-millisecond task
    * time: 57 jobs, 4.8 s of inter-job driver gaps, 0.6 s of executor
    * time. Collecting the sample once is the [[Ivf.train]] /
    * [[Pca.train]] contract (bounded by `maxTrainRows` — at the 1M
    * cap with pipeline-scale d the collect is tens of MB, far under
    * the driver-result bound), and the loop is the same damped ridge
    * Newton step: ~(d+2)²/2 fused multiply-adds per row per
    * iteration, milliseconds at the cap. Per-term arithmetic is
    * unchanged; only the summation ORDER differs (sequential instead
    * of partition-tree), which is within the operator's existing
    * determinism contract — trained weights were already "per
    * partitioning", and the gate renders whatever weights were
    * trained as literals on both engines.
    */
  def trainLogistic(df: DataFrame, idCol: String, features: Seq[(String, Column)],
      label: Column, iters: Int = 25, ridge: Double = 1e-4,
      maxTrainRows: Long = 1L << 20): Model = {
    val d = features.length
    val nAll = df.count()
    require(nAll > 0, "empty training frame")
    val every = math.max(1L, nAll / math.max(maxTrainRows, 1))
    val sample =
      if (every == 1) df
      else df.filter(pmod(hash(col(idCol)), lit(every)) === 0)

    // spread: the per-doc feature extraction (lexicon scans) is the
    // CPU of this pass and inherits scan parallelism otherwise
    val feats = TextOps.spread(sample, col(idCol)).select(
      (label.cast("double").as("y") +:
        features.zipWithIndex.map { case ((_, c), j) => c.as(s"f$j") }): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = feats.agg(
        count(lit(1)).as("n"),
        (0 until d).flatMap(j => Seq(
          sum(col(s"f$j")).as(s"s$j"),
          sum(col(s"f$j") * col(s"f$j")).as(s"q$j"))): _*).head()
      val n = stats.getLong(0)
      require(n > 1, s"classifier sample needs >= 2 rows, got $n")
      val mean = Array.tabulate(d)(j => stats.getDouble(1 + 2 * j) / n)
      val std = Array.tabulate(d) { j =>
        val v = stats.getDouble(2 + 2 * j) / n - mean(j) * mean(j)
        math.max(math.sqrt(math.max(v, 0.0)), 1e-9)
      }

      // ONE collect of the persisted sample: y plus the standardized
      // design row (x_j = (f_j − mean_j)/std_j, the identical
      // per-term IEEE arithmetic the per-iteration Columns computed)
      val rows = feats.collect()
      val nn = rows.length
      val ys = new Array[Double](nn)
      val xs = new Array[Double](nn * d)
      var i = 0
      while (i < nn) {
        val r = rows(i)
        ys(i) = r.getDouble(0)
        var j = 0
        while (j < d) { xs(i * d + j) = (r.getDouble(1 + j) - mean(j)) / std(j); j += 1 }
        i += 1
      }

      val dd = d + 1 // bias as coordinate 0
      var beta = new Array[Double](dd)
      val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
      var it = 0
      var stop = false
      while (it < iters && !stop) {
        val g = new Array[Double](dd)
        val h = breeze.linalg.DenseMatrix.zeros[Double](dd, dd)
        var loss = 0.0
        i = 0
        while (i < nn) {
          var z = beta(0)
          var j = 0
          while (j < d) { z += beta(j + 1) * xs(i * d + j); j += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val r = p * (1.0 - p)
          val err = ys(i) - p
          g(0) += err
          var a = 0
          while (a < d) { g(a + 1) += err * xs(i * d + a); a += 1 }
          // upper triangle of X^T R X with the bias as coordinate 0
          h(0, 0) += r
          a = 0
          while (a < d) {
            h(0, a + 1) += r * xs(i * d + a)
            var b = a
            while (b < d) {
              h(a + 1, b + 1) += r * xs(i * d + a) * xs(i * d + b); b += 1
            }
            a += 1
          }
          loss += -(ys(i) * math.log(math.max(p, 1e-12)) +
            (1.0 - ys(i)) * math.log(math.max(1.0 - p, 1e-12)))
          i += 1
        }
        // mirror the triangle, damp, solve — unchanged from r15
        var a = 0
        while (a < dd) {
          var b = a + 1
          while (b < dd) { h(b, a) = h(a, b); b += 1 }
          h(a, a) += ridge * n
          a += 1
        }
        val delta = h \ breeze.linalg.DenseVector(g)
        beta = Array.tabulate(dd)(j => beta(j) + delta(j))
        val mloss = loss / n
        stop = losses.lastOption.exists(prev => math.abs(prev - mloss) < 1e-10)
        losses += mloss
        it += 1
      }
      Model(beta(0), beta.drop(1), mean, std, losses.toSeq)
    } finally { feats.unpersist(blocking = false): Unit }
  }

  /** The linear score z as a Column — literal weights, left-to-right
    * double adds, mirrored verbatim by the oracle SQL.
    */
  def score(features: Seq[(String, Column)], model: Model): Column =
    features.zipWithIndex.foldLeft(lit(model.bias): Column) {
      case (acc, ((_, c), j)) =>
        acc + lit(model.weights(j)) *
          ((c - lit(model.mean(j))) / lit(model.std(j)))
    }
}

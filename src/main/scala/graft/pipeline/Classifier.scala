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

  /** IRLS / Newton (what R's `glm` runs): per iteration ONE
    * aggregation computes the full Hessian X^T R X (R = p(1−p)), the
    * gradient, and the loss — (d+1)(d+2)/2 + (d+1) + 1 sums through
    * the partial-agg tree — then the driver solves the damped ridge
    * system ((H + λI) Δ = g, breeze, microseconds at pipeline d).
    * Quadratic convergence: ~8 iterations where gradient descent
    * needed hundreds, which matters because iteration cost is
    * job-launch dominated at sample sizes this small. The ridge λ
    * keeps the Hessian invertible under perfect separation (where ML
    * weights diverge); iteration stops early when the loss stops
    * moving. Input capped by the deterministic id-hash sample (the
    * [[Ivf.train]]/[[Pca.train]] contract).
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

    val feats = sample.select(
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

      val dd = d + 1 // bias as coordinate 0
      var beta = new Array[Double](dd)
      val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
      var it = 0
      var stop = false
      while (it < iters && !stop) {
        val xs = lit(1.0) +:
          (0 until d).map(j => (col(s"f$j") - lit(mean(j))) / lit(std(j)))
        val z = xs.zipWithIndex.foldLeft(lit(0.0): Column) {
          case (acc, (x, j)) => acc + lit(beta(j)) * x
        }
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val r = p * (lit(1.0) - p)
        val err = col("y") - p
        val gradCols = (0 until dd).map(j => sum(err * xs(j)).as(s"g$j"))
        val hessCols = for { a <- 0 until dd; b <- a until dd }
          yield sum(r * xs(a) * xs(b)).as(s"h${a}_$b")
        val lossCol = sum(-(col("y") * log(greatest(p, lit(1e-12))) +
          (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12))))).as("loss")
        val row = feats.agg(gradCols.head, (gradCols.tail ++ hessCols :+ lossCol): _*)
          .head()
        val g = breeze.linalg.DenseVector.tabulate(dd)(j => row.getDouble(j))
        val h = breeze.linalg.DenseMatrix.zeros[Double](dd, dd)
        var idx = dd
        for { a <- 0 until dd; b <- a until dd } {
          h(a, b) = row.getDouble(idx); h(b, a) = h(a, b); idx += 1
        }
        (0 until dd).foreach(j => h(j, j) += ridge * n)
        val delta = h \ g
        beta = Array.tabulate(dd)(j => beta(j) + delta(j))
        val loss = row.getDouble(idx) / n
        stop = losses.lastOption.exists(prev => math.abs(prev - loss) < 1e-10)
        losses += loss
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

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

  /** Batch gradient descent on standardized features. One aggregation
    * per iteration over the persisted sample; input capped by the
    * deterministic id-hash sample (the [[Ivf.train]]/[[Pca.train]]
    * contract).
    */
  def trainLogistic(df: DataFrame, idCol: String, features: Seq[(String, Column)],
      label: Column, iters: Int = 50, lr: Double = 0.5,
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

      var bias = 0.0
      val w = new Array[Double](d)
      val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to iters).foreach { _ =>
        val xs = (0 until d).map(j => (col(s"f$j") - lit(mean(j))) / lit(std(j)))
        val z = xs.zipWithIndex.foldLeft(lit(bias): Column) {
          case (acc, (x, j)) => acc + lit(w(j)) * x
        }
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val err = p - col("y")
        val row = feats.agg(
          sum(err).as("g_b"),
          (0 until d).map(j => sum(err * xs(j)).as(s"g$j")) :+
            sum(-(col("y") * log(greatest(p, lit(1e-12))) +
              (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12)))))
              .as("loss"): _*).head()
        bias -= lr * row.getDouble(0) / n
        (0 until d).foreach(j => w(j) -= lr * row.getDouble(1 + j) / n)
        losses += row.getDouble(1 + d) / n
      }
      Model(bias, w, mean, std, losses.toSeq)
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

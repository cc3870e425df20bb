package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Classifier

/** Trained logistic classifier (pipeline/Classifier.scala): loss
  * descends, a separable problem separates, the real en-vs-rest task
  * beats the base rate comfortably, and scoring is the rendered
  * arithmetic (driver replay matches the distributed column).
  */
class ClassifierSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val feats = Classifier.langFeatures(col("text"))
  private lazy val target = graft.pipeline.TextOps.langId(col("text")) === "en"
  private lazy val model =
    Classifier.trainLogistic(docs, "doc_id", feats, target)

  test("training loss is non-increasing at the tail") {
    val l = model.losses
    assert(l.size >= 3)
    assert(l.last < l.head, s"loss must descend: ${l.head} -> ${l.last}")
    // allow early oscillation, require the last half monotone-ish
    l.drop(l.size / 2).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"tail loss rose: $a -> $b")
    }
  }

  test("distilling langId beats its base rate; random labels are unlearnable") {
    val z = Classifier.score(feats, model)
    val scored = docs.select(target.as("y"), (z > 0).as("p"))
    val n = scored.count()
    val acc = scored.filter(col("y") === col("p")).count().toDouble / n
    val pos = docs.filter(target).count().toDouble / n
    val base = math.max(pos, 1.0 - pos)
    assert(acc >= 0.97 && acc > base, s"accuracy $acc (base rate $base)")

    // the corpus' lang column is uncorrelated with the text by
    // construction — a classifier trained on it must sit at the base
    // rate, which is exactly why the gate distills the heuristic
    val mRand = Classifier.trainLogistic(docs, "doc_id", feats,
      col("lang") === "en")
    val zr = Classifier.score(feats, mRand)
    val accR = docs.select((col("lang") === "en").as("y"), (zr > 0).as("p"))
      .filter(col("y") === col("p")).count().toDouble / n
    val posR = docs.filter(col("lang") === "en").count().toDouble / n
    val baseR = math.max(posR, 1.0 - posR)
    assert(accR <= baseR + 0.08, s"random labels learned?! acc=$accR base=$baseR")
  }

  test("a linearly separable toy problem separates") {
    val toy = (0 until 200).map { i =>
      val y = i % 2
      // feature = y + small deterministic noise
      (i.toLong, y.toDouble + (i % 7 - 3) * 0.01, y)
    }.toDF("id", "f", "y")
    val m = Classifier.trainLogistic(toy, "id", Seq("f" -> col("f")),
      col("y") === 1)
    val z = Classifier.score(Seq("f" -> col("f")), m)
    val wrong = toy.select((col("y") === 1).as("y"), (z > 0).as("p"))
      .filter(col("y") =!= col("p")).count()
    assert(wrong === 0L)
  }

  test("distributed score equals the driver replay of the literal arithmetic") {
    val z = Classifier.score(feats, model)
    val rows = docs.limit(40).select(col("doc_id"), col("text"), z.as("z")).collect()
    rows.foreach { r =>
      val ts = r.getString(1).split(" ", -1)
      val n = ts.length.toDouble
      val ratios = graft.pipeline.TextOps.lexicons.map { case (_, lex) =>
        ts.count(lex.toSet).toDouble / n
      }
      val mwl = BigDecimal((r.getString(1).length - (ts.length - 1)).toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val fs = ratios :+ mwl
      val want = fs.zipWithIndex.foldLeft(model.bias) { case (acc, (f, j)) =>
        acc + model.weights(j) * ((f - model.mean(j)) / model.std(j))
      }
      assert(r.getDouble(2) === want, s"doc ${r.getLong(0)}")
    }
  }
}

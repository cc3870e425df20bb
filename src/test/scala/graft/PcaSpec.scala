package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Pca, Similarity}

/** PCA training and projection (pipeline/Pca.scala): orthonormality,
  * variance accounting, determinism, the MatVec ≡ driver bit
  * contract, and measured ANN recall in the reduced space.
  */
class PcaSpec extends GraftSuite {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val model = Pca.train(spark, emb, "vec_id", "embedding", dOut = 16)

  test("projection rows are orthonormal") {
    val p = model.projection
    for (a <- p.indices; b <- a until p.length) {
      val dot = p(a).zip(p(b)).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"rows $a,$b dot=$dot")
    }
  }

  test("eigenvalues descend and the kept dims beat the uniform share") {
    val ev = model.eigenvalues
    assert(ev.length === 64)
    ev.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    // top-16 of 64 eigenvalues always hold >= 16/64 of the trace; on
    // the near-isotropic synthetic corpus they land ~0.38 — assert
    // strictly above uniform so a broken ordering would fail
    assert(model.varianceExplained > 16.0 / 64,
      s"varianceExplained=${model.varianceExplained}")
  }

  test("training is deterministic") {
    val again = Pca.train(spark, emb, "vec_id", "embedding", dOut = 16)
    assert(again.projection.map(_.toSeq).toSeq === model.projection.map(_.toSeq).toSeq)
    assert(again.mean.toSeq === model.mean.toSeq)
  }

  test("distributed projection == driver projection, bit for bit") {
    val rows = emb.limit(50)
      .select(col("vec_id"), col("embedding"), Pca.project(col("embedding"), model).as("p"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val got = r.getSeq[Float](2).toArray
      assert(got.toSeq === Pca.driverProject(model, v).toSeq, s"vec ${r.getLong(0)}")
    }
  }

  test("recall survives reduction when the data has low intrinsic dimension") {
    import spark.implicits._
    // 2000 vectors on an 8-dim latent subspace linearly embedded in
    // 64-dim plus small noise — the case PCA is FOR. The sf0.001
    // embeddings are near-isotropic (top-16/64 eigenvalues ≈ 0.38 of
    // variance), where no linear projection can preserve neighbors;
    // asserting recall there would test the data, not the operator.
    val rnd = new scala.util.Random(42)
    val map = Array.fill(8, 64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 2000).map { id =>
      val z = Array.fill(8)(rnd.nextGaussian())
      val v = Array.tabulate(64) { j =>
        (z.indices.map(a => z(a) * map(a)(j)).sum + 0.05 * rnd.nextGaussian()).toFloat
      }
      (id.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.train(spark, df, "vec_id", "embedding", dOut = 16)
    assert(m.varianceExplained > 0.95, s"latent space missed: ${m.varianceExplained}")

    val q = rows.head._2.toArray
    def top10(d: org.apache.spark.sql.DataFrame, qv: Array[Float]): Set[Long] =
      d.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          Similarity.cosine(col("embedding"), typedlit(qv.toSeq)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10).select("vec_id").as[Long].collect().toSet
    val exact = top10(df, q)
    val reduced = top10(
      df.select(col("vec_id"), Pca.project(col("embedding"), m).as("embedding")),
      Pca.driverProject(m, q))
    val recall = exact.intersect(reduced).size / 10.0
    assert(recall >= 0.9, s"recall@10=$recall in the 16-dim space")
  }

  test("ragged embedding arrays fail loudly instead of skewing moments") {
    import spark.implicits._
    val ragged = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.train(spark, ragged, "vec_id", "embedding", dOut = 2)
    }
    assert(e.getMessage.contains("ragged"))
  }
}

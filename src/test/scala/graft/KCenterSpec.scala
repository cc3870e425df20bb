package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Diversity

/** Greedy k-center selection (Diversity.kCenter): farthest-first
  * structure on engineered clusters, coverage-radius monotonicity,
  * determinism. Exact cross-engine arithmetic is the q_embed_kcenter
  * gate's job.
  */
class KCenterSpec extends GraftSuite {
  import spark.implicits._

  // Three well-separated directions + near-duplicates of each.
  private def emb = Seq(
    (1L, Seq(1f, 0f, 0f)),
    (2L, Seq(0.99f, 0.01f, 0f)),
    (3L, Seq(0f, 1f, 0f)),
    (4L, Seq(0.01f, 0.99f, 0f)),
    (5L, Seq(0f, 0f, 1f)),
    (6L, Seq(0f, 0.01f, 0.99f))).toDF("vec_id", "embedding")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    Diversity.kCenter(spark, df, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("3 centers cover the 3 clusters; near-dups are never both picked") {
    val got = run(emb, 3)
    val centers = got.filter(_._2 > 0).sortBy(_._2).map(_._1)
    assert(centers.head === 1L) // min-id seed
    val cluster = Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2)
    assert(centers.map(cluster).distinct.size === 3, s"centers $centers share a cluster")
    // with one center per cluster every point is near its center
    assert(got.forall(_._3 < 100000), "a point is far from all centers")
  }

  test("centers have zero final distance; non-centers positive") {
    val got = run(emb, 3)
    assert(got.filter(_._2 > 0).forall(_._3 === 0L))
    assert(got.filter(_._2 === 0).forall(_._3 > 0L))
  }

  test("coverage radius is non-increasing in k") {
    val radii = (1 to 4).map(k => run(emb, k).map(_._3).max)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a }, radii.toString)
  }

  test("deterministic across repartitioning") {
    assert(run(emb.repartition(5), 3).toSet === run(emb, 3).toSet)
  }
}

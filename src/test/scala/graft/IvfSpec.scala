package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Similarity}

class IvfSpec extends GraftSuite {

  private lazy val emb = graft.sources.Tables(spark, sf001).embeddings

  test("IVF partitions the corpus into non-degenerate cells") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val cells = emb.select(Ivf.assign(col("embedding"), idx).as("cell"))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.size >= 4, s"expected several occupied cells, got $cells")
    assert(cells.values.max < emb.count(), "not all vectors in one cell")
  }

  test("probed IVF search recalls most of the brute-force top-k") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val rest = emb.filter(col("vec_id") =!= 0L)
    val exact = Similarity.topK(rest, "vec_id", "embedding", q.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Ivf.topK(spark, rest, "vec_id", "embedding", idx, q, 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size
    assert(ivf.size == 10)
    assert(recall >= 5, s"recall@10 with 3/8 probes should be decent, got $recall/10")
    // full probe = exact
    val all = Ivf.topK(spark, rest, "vec_id", "embedding", idx, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(all == exact, "probing every cell must equal brute force")
  }
}

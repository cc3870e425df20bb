package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Similarity}

/** SemDeDup: k-means-cell-blocked semantic dedup (keep-lowest-id). */
class SemDedupSpec extends GraftSuite {
  import spark.implicits._

  // two tight clusters on orthogonal axes + one bridge vector
  private def corpus = Seq(
    1L -> Array(1.0f, 0.0f, 0.0f),
    2L -> Array(0.99f, 0.01f, 0.0f),   // near-dup of 1 (same cell)
    3L -> Array(0.98f, 0.02f, 0.0f),   // near-dup of 1 and 2
    10L -> Array(0.0f, 1.0f, 0.0f),
    11L -> Array(0.01f, 0.99f, 0.0f),  // near-dup of 10
    20L -> Array(0.0f, 0.0f, 1.0f)     // lone vector
  ).toDF("vec_id", "embedding")

  test("keeps the lowest id per semantic group, one row per survivor") {
    // hand-built axis cells (trained init would seed centroids from
    // the first nlist vectors — all in cluster A)
    val idx = Ivf.IvfIndex(Array(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 1.0f)))
    graft.functions.NearestCell.register(spark)
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding", idx, minCos = 0.99)
      .collect().map(_.getLong(0)).toSet
    // 2,3 duplicate 1; 11 duplicates 10; 20 survives alone
    assert(kept === Set(1L, 10L, 20L))
  }

  test("a sub-threshold cell-mate is NOT dropped") {
    val df = Seq(
      1L -> Array(1.0f, 0.0f, 0.0f),
      2L -> Array(0.8f, 0.6f, 0.0f) // same half-space, cosine 0.8 < 0.99
    ).toDF("vec_id", "embedding")
    val idx = Ivf.IvfIndex(Array(Array(1.0f, 0.0f, 0.0f)))
    graft.functions.NearestCell.register(spark)
    val kept = Similarity.semDedup(df, "vec_id", "embedding", idx, minCos = 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("near-dups straddling a cell boundary both survive (the paper's approximation)") {
    // identical vectors forced into different cells by a hand-built index:
    // assignment ties break to the lower cell id, so nudge one vector
    // toward each centroid.
    val df = Seq(
      1L -> Array(1.0f, 0.001f),
      2L -> Array(1.0f, -0.001f)
    ).toDF("vec_id", "embedding")
    val idx = Ivf.IvfIndex(Array(Array(0.0f, 1.0f), Array(0.0f, -1.0f)))
    graft.functions.NearestCell.register(spark)
    val out = Similarity.semDedup(df, "vec_id", "embedding", idx, minCos = 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet === Set(1L, 2L), "cross-cell near-dups are out of scope by design")
    assert(out(1L) != out(2L))
  }

  test("incremental == full mine restricted to the batch") {
    val idx = Ivf.IvfIndex(Array(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 1.0f)))
    graft.functions.NearestCell.register(spark)
    val isBatch = col("vec_id") % 2 === 1
    val corpus = this.corpus.filter(!isBatch)
    val batch = this.corpus.filter(isBatch)
    val cells = corpus.select(col("vec_id").as("id"),
      Ivf.assign(col("embedding"), idx).as("cell"))
    val inc = Similarity.semDedupIncremental(corpus, cells, batch,
      "vec_id", "embedding", idx, minCos = 0.99)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val full = Similarity.semDedup(this.corpus, "vec_id", "embedding", idx, minCos = 0.99)
      .filter(col("vec_id") % 2 === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(inc === full)
    // 1 survives (corpus won't drop it); 3 drops (1 is a smaller-id
    // cell-mate); 11 drops (10 in corpus)
    assert(inc.keySet === Set(1L))
  }

  test("incremental refuses batch ids already in the corpus index") {
    val idx = Ivf.IvfIndex(Array(Array(1.0f, 0.0f, 0.0f)))
    graft.functions.NearestCell.register(spark)
    val cells = corpus.select(col("vec_id").as("id"),
      Ivf.assign(col("embedding"), idx).as("cell"))
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedupIncremental(corpus, cells, corpus.limit(2),
        "vec_id", "embedding", idx, minCos = 0.99)
    }
    assert(e.getMessage.contains("already present"))
  }

  test("output schema is (idCol, cell) and cells match assignment") {
    val idx = Ivf.train(spark, corpus, "vec_id", "embedding", nlist = 2)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding", idx, minCos = 2.0) // nothing dups
    assert(out.columns.toSeq === Seq("vec_id", "cell"))
    val cells = corpus.select(col("vec_id"),
      Ivf.assign(col("embedding"), idx).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.collect().foreach(r => assert(cells(r.getLong(0)) == r.getInt(1)))
  }
}

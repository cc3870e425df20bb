package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** BM25 + RRF fusion: score correctness against a hand-computed
  * corpus, ordered-fold determinism under repartitioning, rank
  * discipline, and fusion semantics for ids present in one leg only.
  */
class RetrievalSpec extends GraftSuite {
  import spark.implicits._

  // 4 docs, vocabulary small enough to verify by hand
  private lazy val docs = Seq(
    (1L, "spark join spark"),
    (2L, "join window group"),
    (3L, "window window window window"),
    (4L, "scan filter scan filter")
  ).toDF("doc_id", "text")

  private def bm25Ref(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * (tf * (Retrieval.K1 + 1.0)) /
      (tf + Retrieval.K1 * ((1.0 - Retrieval.B) + Retrieval.B * dl / avgdl))
  }

  test("bm25 matches the closed-form score per document") {
    val got = Retrieval.bm25(docs, "doc_id", col("text"), Seq("spark", "join", "window"))
      .as[(Long, Double)].collect().toMap
    val n = 4L
    val avgdl = (3 + 3 + 4 + 4).toDouble / 4
    // doc 1: spark tf=2 df=1, join tf=1 df=2; fold order = token asc: join, spark
    val d1 = bm25Ref(1, 2, 3, n, avgdl) + bm25Ref(2, 1, 3, n, avgdl)
    val d2 = bm25Ref(1, 2, 3, n, avgdl) + bm25Ref(1, 2, 3, n, avgdl)
    val d3 = bm25Ref(4, 2, 4, n, avgdl)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(math.abs(got(1L) - d1) < 1e-12)
    assert(math.abs(got(2L) - d2) < 1e-12)
    assert(math.abs(got(3L) - d3) < 1e-12)
  }

  test("bm25 is bit-stable under repartitioning (ordered fold)") {
    val a = Retrieval.bm25(docs, "doc_id", col("text"), Seq("spark", "join", "window"))
      .as[(Long, Double)].collect().toMap
    val b = Retrieval.bm25(docs.repartition(7), "doc_id", col("text"),
        Seq("spark", "join", "window"))
      .as[(Long, Double)].collect().toMap
    assert(a == b, "identical doubles required, not just approximately equal")
  }

  test("bm25TopK ranks by rounded score then id, k bounds the output") {
    val top = Retrieval.bm25TopK(docs, "doc_id", col("text"),
        Seq("spark", "join", "window"), 2)
      .select(col("doc_id"), col("rnk")).as[(Long, Long)].collect().toMap
    assert(top.size == 2)
    assert(top.values.toSet == Set(1L, 2L), "ranks are 1..k")
  }

  test("rrfFuse: both-leg ids sum, single-leg ids keep one term") {
    val legA = Seq((10L, 1L), (20L, 2L)).toDF("id", "r")
    val legB = Seq((20L, 1L), (30L, 2L)).toDF("id", "r")
    val got = Retrieval.rrfFuse(Seq((legA, "id", "r"), (legB, "id", "r")))
      .select(col("id"), col("rrf")).as[(Long, Double)].collect().toMap
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(30L) - 1.0 / 62) < 1e-15)
  }

  test("term filter sits under the explode: non-matching tokens never shuffle") {
    val plan = Retrieval.termPostings(docs, "doc_id", col("text"), Seq("spark"))
      .queryExecution.executedPlan.toString
    // the filter on token must appear below the aggregate exchange
    assert(plan.contains("Generate explode"), plan)
    assert(Retrieval.termPostings(docs, "doc_id", col("text"), Seq("spark"))
      .collect().map(_.getLong(3)).sum == 2, "only spark tokens counted")
  }
}

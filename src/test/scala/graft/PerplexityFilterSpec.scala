package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** CCNet-style perplexity bucketing (TextOps.perplexityFilter):
  * buckets match an independently computed sort-and-threshold over
  * the raw LM scores, cutoff ties route whole, and degenerate corpus
  * sizes behave.
  */
class PerplexityFilterSpec extends GraftSuite {
  import spark.implicits._

  // Train corpus: common trigram patterns.
  private def train = Seq(
    (0L, "a b c a b c a b c"),
    (2L, "a b c d e f"),
    (4L, "d e f d e f")).toDF("doc_id", "text")

  // Score corpus: 10 docs ranging from fully in-domain to fully OOV.
  private def score = Seq(
    (1L, "a b c a b c"),
    (3L, "a b c d e f"),
    (5L, "d e f"),
    (7L, "a b c x"),
    (9L, "x y z"),
    (11L, "q r s t u v"),
    (13L, "a b c"),
    (15L, "d e f a b c"),
    (17L, "x a b c"),
    (19L, "a a a a")).toDF("doc_id", "text")

  private def run(sc: org.apache.spark.sql.DataFrame) =
    TextOps.perplexityFilter(train, sc, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap

  test("buckets equal an independent sort-and-threshold of the raw scores") {
    val raw = TextOps.stupidBackoffLogProb(train, score, "doc_id", col("text"))
      .collect().map { r =>
        val n = r.getLong(1); val sum = r.getLong(2)
        r.getLong(0) -> math.floor(-sum.toDouble / n.toDouble).toLong
      }.toMap
    val n = raw.size
    val sorted = raw.toSeq.sortBy { case (id, nll) => (nll, id) }
    val kHead = (300 * n + 999) / 1000 // = 3 for n = 10
    val kMid = (700 * n + 999) / 1000 // = 7
    val cHead = sorted(kHead - 1)._2
    val cMid = sorted(kMid - 1)._2
    val expected = raw.map { case (id, nll) =>
      id -> (nll, if (nll <= cHead) "head" else if (nll <= cMid) "middle" else "tail")
    }
    assert(run(score) === expected)
    // Sanity on the engineered corpus: the pure-OOV doc is tail, the
    // most in-domain repeated trigram doc is head.
    assert(expected(9L)._2 === "tail")
    assert(expected(1L)._2 === "head")
  }

  test("cutoff ties route by value: duplicate docs share a bucket") {
    val dup = score.union(Seq((21L, "x y z"), (23L, "x y z")).toDF("doc_id", "text"))
    val got = run(dup)
    assert(got(9L)._1 === got(21L)._1 && got(21L)._1 === got(23L)._1)
    assert(got(9L)._2 === got(21L)._2 && got(21L)._2 === got(23L)._2)
  }

  test("single-doc corpus lands in head") {
    val got = run(score.filter(col("doc_id") === 1L))
    assert(got.size === 1 && got(1L)._2 === "head")
  }

  test("deterministic across repartitioning") {
    assert(run(score.repartition(7)) === run(score))
  }
}

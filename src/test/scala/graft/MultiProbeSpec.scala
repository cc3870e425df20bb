package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Multi-probe LSH ANN (Similarity.annTopK with probes > 1).
  *
  * The planted-neighbor corpus is the honest recall test: near
  * neighbors of a query differ from it only across low-margin
  * hyperplanes, which is exactly the probe order — so a few probes
  * recover neighbors that single-bucket search misses. (On a corpus
  * of mutually near-orthogonal vectors — like the synthetic
  * `embeddings` table, top-1 cosine ≈ 0.37 — "neighbors" share few
  * bucket bits with the query and NO sublinear method has high
  * recall; asserting 0.9 there would test the data, not the code.)
  */
class MultiProbeSpec extends GraftSuite {

  private val dim = 64

  /** 200 distractors + 12 planted near-duplicates of the query
    * (query + 10% noise), deterministic seed.
    */
  private lazy val (query, corpus) = {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val q = vec()
    val planted = (0 until 12).map { i =>
      (1000L + i, q.zipWithIndex.map { case (x, _) =>
        x + (rnd.nextDouble() * 2 - 1).toFloat * 0.1f })
    }
    val distractors = (0 until 200).map(i => (i.toLong, vec()))
    (q.toSeq, distractors ++ planted)
  }

  private lazy val emb = {
    import spark.implicits._
    corpus.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("multi-probe recovers planted neighbors single-probe misses; full probe is exact") {
    val exact = ids(Similarity.topK(emb, "vec_id", "embedding", query, 10))
    assert(exact.forall(_ >= 1000L), "brute-force top-10 are the planted near-dups")

    val r1  = (ids(Similarity.annTopK(emb, "vec_id", "embedding", query, 10,
      planes = 8, probes = 1)).toSet & exact.toSet).size
    val r16 = (ids(Similarity.annTopK(emb, "vec_id", "embedding", query, 10,
      planes = 8, probes = 16)).toSet & exact.toSet).size
    assert(r16 >= 9, s"recall@10 with 16/256 probes must be >= 0.9, got $r16/10")
    assert(r16 >= r1, s"probing more buckets never loses recall ($r1 -> $r16)")

    val full = ids(Similarity.annTopK(emb, "vec_id", "embedding", query, 10,
      planes = 8, probes = 256))
    assert(full == exact, "probing every bucket degenerates to brute force")
  }

  test("probe sequence starts at the query's bucket and is deterministic") {
    val s1 = Similarity.probeSequence(query, planes = 8, probes = 20)
    val s2 = Similarity.probeSequence(query, planes = 8, probes = 20)
    assert(s1 == s2)
    assert(s1.distinct.size == s1.size, "no duplicate buckets")
    // first probe = the unflipped bucket (empty mask has margin sum 0)
    assert(s1.head == Similarity.probeSequence(query, 8, 1).head)
  }

  test("hamming-radius probing equals the explicit bucket-set filter") {
    val exact = ids(Similarity.topK(emb, "vec_id", "embedding", query, 10))
    val within = ids(Similarity.annTopKWithin(emb, "vec_id", "embedding", query, 10,
      planes = 8, radius = 8))
    assert(within == exact, "radius = planes reaches every bucket")
  }
}

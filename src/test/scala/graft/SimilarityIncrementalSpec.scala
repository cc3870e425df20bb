package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sources.Tables

/** Incremental embedding near-dup mining must equal the full
  * bucket-blocked mine restricted to pairs involving the new batch —
  * the same invariant DedupIncrementalSpec pins for text bands,
  * on the embedding leg of the O(batch) ingestion story.
  */
class SimilarityIncrementalSpec extends GraftSuite {

  private val DIM = 64

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("va", "vb", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental == full mine filtered to batch-involving pairs") {
    val emb = Tables(spark, sf001).embeddings
    val corpus = emb.filter(col("vec_id") % 7 =!= 3)
    val batch  = emb.filter(col("vec_id") % 7 === 3)

    val inc = Similarity.lshBlockedPairsIncremental(
      corpus, Similarity.bucketTable(corpus, "vec_id", "embedding", DIM),
      batch, "vec_id", "embedding", DIM, minCos = 0.25)

    val full = Similarity.lshBlockedPairs(emb, "vec_id", "embedding", DIM, minCos = 0.25)
      .filter(col("va") % 7 === 3 || col("vb") % 7 === 3)

    val (gi, gf) = (pairSet(inc), pairSet(full))
    assert(gi == gf, s"incremental=$gi full-filtered=$gf")
    assert(gi.nonEmpty, "split should leave at least one batch-involving pair at sf0.01")
  }

  test("corpus-corpus pairs never re-form; batch-batch and batch-corpus surface") {
    // 4 hand-built vectors: 1~2 corpus near-dups (excluded), 10~1
    // batch-corpus, 10~11 batch-batch, 3 isolated
    def v(seed: Int): Seq[Float] =
      Seq.tabulate(DIM)(d => (math.sin(seed * 31 + d).toFloat))
    def jitter(base: Seq[Float], eps: Float): Seq[Float] =
      base.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) eps else -eps) }
    val corpus = spark.createDataFrame(Seq(
      (1L, v(1)), (2L, jitter(v(1), 0.01f)), (3L, v(99)))).toDF("id", "e")
    val batch = spark.createDataFrame(Seq(
      (10L, jitter(v(1), 0.02f)), (11L, jitter(v(1), 0.03f)))).toDF("id", "e")

    val got = Similarity.lshBlockedPairsIncremental(
      corpus, Similarity.bucketTable(corpus, "id", "e", DIM),
      batch, "id", "e", DIM, minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got.forall { case (a, b) => a >= 10 || b >= 10 },
      s"corpus-corpus pair leaked into $got")
    assert(got.contains((10L, 11L)), s"batch-batch pair missing from $got")
    assert(got.exists { case (a, b) => a < 10 || b < 10 }, s"batch-corpus pair missing from $got")
    // the 1~2 corpus pair the full mine WOULD find is deliberately absent
    val full = Similarity.lshBlockedPairs(corpus.unionByName(batch), "id", "e", DIM, minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.contains((1L, 2L)), "sanity: corpus pair exists in the full mine")
    assert(got == full.filter { case (a, b) => a >= 10 || b >= 10 })
  }

  test("autoPlanes sizes the bucket space to the corpus, clamped") {
    assert(Similarity.autoPlanes(100) == 6, "min clamp")
    assert(Similarity.autoPlanes(2048, targetBucketRows = 32) == 6)
    assert(Similarity.autoPlanes(200000) == 13, "200k vectors need ~8k buckets")
    assert(Similarity.autoPlanes(1000000000L) == 20, "max clamp")
    // occupancy ~ constant: doubling the corpus adds ~one plane
    assert(Similarity.autoPlanes(400000) == Similarity.autoPlanes(200000) + 1)
  }

  test("more planes shrink bucket occupancy; exact duplicates survive any plane count") {
    val emb = Tables(spark, sf001).embeddings
    def maxBucket(planes: Int): Long =
      Similarity.bucketTable(emb, "vec_id", "embedding", DIM, planes)
        .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    val coarse = maxBucket(6)
    val fine = maxBucket(12)
    assert(fine < coarse, s"12 planes must cut occupancy: $fine vs $coarse")

    // an exact duplicate co-buckets at EVERY plane count — the dedup
    // regime autoPlanes' recall note relies on
    val base = emb.limit(1).select(col("embedding")).head().getSeq[Float](0)
    val corpus = spark.createDataFrame(Seq((1L, base), (2L, Seq.fill(DIM)(9.9f)))).toDF("id", "e")
    val batch  = spark.createDataFrame(Seq((10L, base))).toDF("id", "e")
    for (p <- Seq(8, 16, 20)) {
      val got = Similarity.lshBlockedPairsIncremental(
        corpus, Similarity.bucketTable(corpus, "id", "e", DIM, p),
        batch, "id", "e", DIM, minCos = 0.99, planes = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 10L)), s"exact dup lost at $p planes: $got")
    }
  }

  test("published bucket index refuses a mismatched plane count or missing sidecar") {
    val emb = Tables(spark, sf001).embeddings
    val path = java.nio.file.Files.createTempDirectory("bucket-idx").toString + "/buckets"
    Similarity.publishBucketTable(emb, "vec_id", "embedding", DIM, planes = 8, path)
    // matching geometry opens fine
    assert(Similarity.openBucketTable(spark, path, DIM, 8).count() == emb.count())
    // probing a 8-plane index with 9-plane batch buckets would match
    // ~nothing and silently lose pairs — it must be an error instead
    val e = intercept[IllegalArgumentException](
      Similarity.openBucketTable(spark, path, DIM, 9))
    assert(e.getMessage.contains("geometry mismatch"), e.getMessage)
    // a bare parquet dir (no sidecar) is equally unverifiable
    val bare = java.nio.file.Files.createTempDirectory("bucket-bare").toString + "/buckets"
    Similarity.bucketTable(emb, "vec_id", "embedding", DIM, 8)
      .write.mode("overwrite").parquet(bare)
    val e2 = intercept[IllegalArgumentException](
      Similarity.openBucketTable(spark, bare, DIM, 8))
    assert(e2.getMessage.contains("sidecar"), e2.getMessage)
  }

  test("a batch id already in the corpus index is an error, not silent pair loss") {
    val emb = Tables(spark, sf001).embeddings
    val corpus = emb.filter(col("vec_id") < 50)
    val batch  = emb.filter(col("vec_id") < 10) // overlaps
    val e = intercept[IllegalArgumentException] {
      Similarity.lshBlockedPairsIncremental(
        corpus, Similarity.bucketTable(corpus, "vec_id", "embedding", DIM),
        batch, "vec_id", "embedding", DIM, minCos = 0.25)
    }
    assert(e.getMessage.contains("disjoint ids"), e.getMessage)
  }
}

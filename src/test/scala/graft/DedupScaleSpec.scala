package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Duplicate-heavy corpora break naive MinHash-LSH: an exact cluster
  * of k copies shares every band key, making one bucket's pair join
  * O(k²). This spec pins the scale-safe composition — canonicalize
  * exact duplicates first, LSH only the survivors.
  */
class DedupScaleSpec extends GraftSuite {

  test("10k identical copies: canonical LSH is bounded and pair-identical to the dedup'd corpus") {
    // a boilerplate page with 10,000 copies (naive all-pairs in its
    // bucket would be ~5e7 candidates per band) + a near-dup pair +
    // one unrelated doc
    val boiler = spark.range(0, 10000)
      .select(col("id"),
        lit("cookie banner terms of service all rights reserved contact us").as("text"))
    val tail = spark.createDataFrame(Seq(
      (20001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20002L, "alpha beta gamma delta epsilon zeta eta iota"),
      (20003L, "completely different content with other words entirely")
    )).toDF("id", "text")
    val corpus = boiler.unionByName(tail)

    // the exact-cluster membership comes from the canonical map...
    val cmap = Dedup.canonicalize(corpus, "id", col("text"))
    assert(cmap.filter(col("rep") === 0L).count() == 10000, "one exact cluster, rep = min id")
    assert(cmap.filter(col("id") === col("rep")).count() == 4, "4 distinct contents")

    // ...and mining runs over 4 canonical docs, not 10,003: every LSH
    // bucket is bounded by the number of DISTINCT contents
    val sigBuckets = Dedup.lshCandidates(
      corpus.join(cmap, "id").filter(col("id") === col("rep")).select("id", "text"),
      "id", col("text"))
    assert(sigBuckets.count() <= 6, "candidate pairs bounded by distinct-content count")

    val got = Dedup.nearDuplicatesCanonical(corpus, "id", col("text"), 0.5)
      .select("da", "db", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // identical pair semantics to plain nearDuplicates over a corpus
    // that was exact-dedup'd up front
    val dedupd = corpus.join(cmap, "id").filter(col("id") === col("rep"))
      .select("id", "text")
    val expected = Dedup.nearDuplicates(dedupd, "id", col("text"), 0.5)
      .select("da", "db", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)

    // copies of one content never mine as near-dup pairs (they are
    // exact duplicates, handled by the canonical map)
    assert(got.forall { case (a, b, _) => a != b && !(a < 10000 && b < 10000) })

    // the full decision composes: near-dup clusters over canonical
    // pairs, then exact members follow their representative
    val clusters = Dedup.clusterPairs(
      Dedup.nearDuplicatesCanonical(corpus, "id", col("text"), 0.5))
    val canonical = cmap.join(clusters.withColumnRenamed("id", "rep"), Seq("rep"), "left")
      .select(col("id"), coalesce(col("canonical"), col("rep")).as("canonical"))
    assert(canonical.count() == 10003)
    assert(canonical.filter(col("canonical") === 0L).count() == 10000,
      "every boilerplate copy resolves to the exact-cluster representative")
    if (got.nonEmpty) // near pair mined => 20002 follows 20001
      assert(canonical.filter(col("id") === 20002L).head().getLong(1) == 20001L)
  }

  test("clusterPairs: driver union-find == distributed HashMin, row for row") {
    val pairs = Dedup.nearDuplicates(
      graft.sources.Tables(spark, "/root/testdata/sf0.001").documents,
      "doc_id", col("text"), 0.5)
    val fast = Dedup.clusterPairs(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distributed = Dedup.clusterPairs(pairs, maxDriverPairs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.nonEmpty, "the 0.5-threshold mine must produce clusters to compare")
    assert(fast == distributed,
      "the union-find fast path must reproduce the HashMin components exactly")

    // chain shape (A-B, B-C without A-C): transitivity + min-member
    // canonicals survive the fast path
    val chain = spark.createDataFrame(Seq((5L, 3L), (3L, 9L), (20L, 30L)))
      .toDF("da", "db")
    val got = Dedup.clusterPairs(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }
}

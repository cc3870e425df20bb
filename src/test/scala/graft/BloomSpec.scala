package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Bloom, Dedup}

/** Bloom filter (pipeline/Bloom.scala): no false negatives by
  * construction, bounded false positives, and exact-result equality
  * of the decontamination prefilter at every filter size.
  */
class BloomSpec extends GraftSuite {
  import spark.implicits._

  test("params: pow2 sizing, k in [1,8], tiny inputs get the floor") {
    val (m0, k0) = Bloom.params(0, 10)
    assert(m0 === 1024 && k0 >= 1)
    val (m, k) = Bloom.params(100000, 10)
    assert(Integer.bitCount(m) === 1 && m >= 1000000 && (1 to 8).contains(k))
  }

  test("no false negatives: every built key probes true") {
    val keys = (0 until 5000).map(i => s"key-$i").toDF("s")
    val (m, k) = Bloom.params(5000, 8)
    val words = Bloom.build(keys, col("s"), m, k)
    val misses = keys.filter(!Bloom.mightContain(words, m, k, col("s"))).count()
    assert(misses === 0L)
  }

  test("false positives are bounded near the design rate") {
    val keys = (0 until 5000).map(i => s"key-$i").toDF("s")
    val (m, k) = Bloom.params(5000, 10)
    val words = Bloom.build(keys, col("s"), m, k)
    val probe = (0 until 20000).map(i => s"other-$i").toDF("s")
    val fp = probe.filter(Bloom.mightContain(words, m, k, col("s"))).count()
    // 10 bits/key targets ~1% FP; allow generous slack for hash luck
    assert(fp < 20000 * 0.05, s"fp=$fp of 20000")
  }

  test("decontaminateBloom == decontaminate exactly, even when the bloom is tiny") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = Dedup.decontaminate(docs, "doc_id", col("text"), col("doc_id") % 50 === 0)
      .orderBy("id").collect().toSeq
    for (bits <- Seq(10, 1)) { // bits=1 forces a high-FP filter: verify must absorb it
      val got = Dedup.decontaminateBloom(docs, "doc_id", col("text"),
        col("doc_id") % 50 === 0, bitsPerKey = bits)
        .orderBy("id").collect().toSeq
      assert(got === exact, s"bitsPerKey=$bits diverged")
    }
  }

  test("the prefilter is join-free: no Exchange or Join below the candidate filter") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val keys = Seq("a b c", "d e f").toDF("s")
    val (m, k) = Bloom.params(2, 10)
    val words = Bloom.build(keys, col("s"), m, k)
    val pre = docs
      .select(col("doc_id"), explode(graft.pipeline.TextOps.shingles(col("text"), 3)).as("s"))
      .filter(Bloom.mightContain(words, m, k, col("s")))
    val plan = pre.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "prefilter must not join")
    assert(!plan.contains("Exchange"), "prefilter must not shuffle")
  }
}

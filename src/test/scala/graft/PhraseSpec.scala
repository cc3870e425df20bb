package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** Phrase search: scan path semantics (overlaps, duplicates,
  * boundaries), index path ≡ scan path, partition pruning, and
  * phrase visibility across appends.
  */
class PhraseSpec extends GraftSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def scan(docs: org.apache.spark.sql.DataFrame, phrase: Seq[String]) =
    Retrieval.phraseMatch(docs, "doc_id", col("text"), phrase)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("counts overlapping occurrences and reports the first position") {
    val got = scan(docsOf(1L -> "a a a b a a"), Seq("a", "a"))
    assert(got === Seq((1L, 3L, 0L))) // starts 0, 1, 4
  }

  test("duplicate-term phrases only match the exact sequence") {
    val d = docsOf(
      1L -> "x a b a y",  // "a b a" at 1
      2L -> "a b b a x",  // no "a b a"
      3L -> "b a b a b")  // "a b a" at 1... and "b a b" twice
    assert(scan(d, Seq("a", "b", "a")) === Seq((1L, 1L, 1L), (3L, 1L, 1L)))
    assert(scan(d, Seq("b", "a", "b")) === Seq((3L, 2L, 0L)))
  }

  test("docs shorter than the phrase yield no match (and no crash)") {
    // regression: sequence(1, 0) defaults to step -1 in Spark, so the
    // unguarded start list was [1, 0] and slice(ts, 0, n) threw
    val d = docsOf(1L -> "ab", 2L -> "", 3L -> "slow hash batch here")
    assert(scan(d, Seq("slow", "hash", "batch")) === Seq((3L, 1L, 0L)))
  }

  test("a phrase split across two docs never matches") {
    val got = scan(docsOf(1L -> "end of doc slow hash", 2L -> "batch next doc"),
      Seq("slow", "hash", "batch"))
    assert(got.isEmpty)
  }

  test("single-term phrase degenerates to term occurrences") {
    assert(scan(docsOf(1L -> "w x w"), Seq("w")) === Seq((1L, 2L, 0L)))
  }

  test("index path == scan path on the testdata corpus, and prunes buckets") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = graft.queries.SessionPublish.tempDir("phrase-spec")
    Retrieval.publishIndex(docs, "doc_id", col("text"), path, buckets = 16)
    for (phrase <- Seq(Seq("big", "order", "scan"), Seq("order", "scan"),
        Seq("scan"), Seq("no-such-token", "order"))) {
      val direct = scan(docs, phrase)
      val viaIdx = Retrieval.phraseSearchIndex(spark, path, phrase)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(viaIdx === direct, s"phrase $phrase diverged")
    }
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      Retrieval.phraseSearchIndex(spark, path, Seq("big", "order", "scan"))
        .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert(scans.nonEmpty)
    val wanted = Seq("big", "order", "scan").map(Retrieval.tokenBucket(_, 16)).distinct.size
    assert(scans.map(_.selectedPartitions.partitionCount).forall(_ <= wanted))
  }

  test("appended documents are phrase-visible") {
    val base = docsOf(1L -> "slow hash batch here")
    val batch = docsOf(10L -> "also slow hash batch slow hash batch")
    val path = graft.queries.SessionPublish.tempDir("phrase-spec-inc")
    Retrieval.publishIndex(base, "doc_id", col("text"), path, buckets = 4)
    Retrieval.appendIndex(batch, "doc_id", col("text"), path)
    val got = Retrieval.phraseSearchIndex(spark, path, Seq("slow", "hash", "batch"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 1L, 0L), (10L, 2L, 1L)))
  }
}

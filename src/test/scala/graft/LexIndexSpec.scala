package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.{Retrieval, TextOps}

/** Published inverted-index layout: bucket-hash lockstep, partition
  * pruning, bit-identical scores vs the one-shot path, append ≡
  * republish, kind guard.
  */
class LexIndexSpec extends GraftSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private lazy val corpus = docsOf(
    1L -> "spark join spark window scan",
    2L -> "join window group filter row",
    3L -> "window window window batch",
    4L -> "scan filter scan filter table",
    5L -> "spark table column row value")

  test("driver tokenBucket matches the column expression") {
    val toks = Seq("spark", "join", "window", "scan", "Ω-unicode", "", "a b")
    val viaCol = toks.toDF("t")
      .select(TextOps.hash32(0, col("t")) % 8).as[Long].collect().toSeq
    val viaDriver = toks.map(t => Retrieval.tokenBucket(t, 8).toLong)
    assert(viaCol == viaDriver)
  }

  test("searchIndex == bm25TopK bit-for-bit, and prunes to the terms' buckets") {
    val path = graft.queries.SessionPublish.tempDir("lex-spec")
    Retrieval.publishIndex(corpus, "doc_id", col("text"), path, buckets = 8)

    val terms = Seq("spark", "join", "window")
    val direct = Retrieval.bm25TopK(corpus, "doc_id", col("text"), terms, 10)
      .select(col("doc_id"), col("bm25"), col("rnk"))
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq
    val indexed = Retrieval.searchIndex(spark, path, terms, 10)
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq
    assert(indexed == direct, "identical doubles, not approximately equal")

    // AQE wraps the aggregate exchanges; the assertion is about the
    // STATIC scan shape, so inspect with AQE off (repo-wide pattern,
    // IvfBatchSpec.scala:70)
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      Retrieval.searchIndex(spark, path, terms, 10)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert(scans.nonEmpty)
    // the plan reads postings twice (df leg + scoring leg); EACH scan
    // must stay within the terms' buckets
    val wanted = terms.map(Retrieval.tokenBucket(_, 8)).distinct.size
    val total = spark.read.parquet(s"$path/postings")
      .select(col("tb")).distinct().count()
    val perScan = scans.map(_.selectedPartitions.partitionCount)
    assert(perScan.forall(_ <= wanted),
      s"each scan reads at most the terms' buckets: $perScan > $wanted")
    assert(perScan.forall(_ < total), s"must prune: $perScan of $total buckets")
  }

  test("appendIndex scores bit-identically to a full republish of the union") {
    val base = docsOf(1L -> "spark join window", 2L -> "join filter scan")
    val batch = docsOf(10L -> "spark spark window table", 11L -> "window row scan")
    val terms = Seq("spark", "window", "scan")

    val inc = graft.queries.SessionPublish.tempDir("lex-spec-inc")
    Retrieval.publishIndex(base, "doc_id", col("text"), inc, buckets = 4)
    Retrieval.appendIndex(batch, "doc_id", col("text"), inc)

    val full = graft.queries.SessionPublish.tempDir("lex-spec-full")
    Retrieval.publishIndex(base.unionAll(batch), "doc_id", col("text"), full, buckets = 4)

    val a = Retrieval.searchIndex(spark, inc, terms, 10)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val b = Retrieval.searchIndex(spark, full, terms, 10)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("a non-lex sidecar fails loud") {
    val path = graft.queries.SessionPublish.tempDir("lex-spec-kind")
    graft.core.Sidecar.writeProps(s"$path/_lexmeta",
      Seq("kind" -> "ivf", "buckets" -> "4", "n" -> "1", "sum_dl" -> "1"))
    val e = intercept[IllegalArgumentException](
      Retrieval.searchIndex(spark, path, Seq("x"), 5))
    assert(e.getMessage.contains("kind"))
  }

  test("terms hitting every bucket still return correct results (no pruning, no error)") {
    val path = graft.queries.SessionPublish.tempDir("lex-spec-all")
    Retrieval.publishIndex(corpus, "doc_id", col("text"), path, buckets = 2)
    val allTerms = Seq("spark", "join", "window", "scan", "filter", "table",
      "group", "row", "batch", "column", "value")
    val got = Retrieval.searchIndex(spark, path, allTerms, 10)
      .as[(Long, Double, Long)].collect()
    assert(got.length == 5, "every doc matches at least one term")
  }
}

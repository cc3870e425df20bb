package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Span removal (Dedup.removeRepeatedSpans): coverage semantics on
  * crafted corpora — overlap unions, within-doc-only spans survive,
  * untouched docs pass through byte-identical.
  */
class SpanRemoveSpec extends GraftSuite {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int): Map[Long, (String, Long)] =
    Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", col("text"),
      n = n, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("a shared 3-span is cut from both docs, the rest survives") {
    val got = run(Seq(
      (1L, "x x a b c y y"),
      (2L, "z a b c w")), n = 3)
    assert(got(1L) === (("x x y y", 3L)))
    assert(got(2L) === (("z w", 3L)))
  }

  test("overlapping shared spans union their coverage") {
    // "a b c d" shared between docs => spans (a b c) and (b c d) both
    // heavy; all four tokens covered, not just the first three
    val got = run(Seq(
      (1L, "p a b c d q"),
      (2L, "a b c d")), n = 3)
    assert(got(1L) === (("p q", 4L)))
    assert(got(2L) === (("", 4L)))
  }

  test("a span repeated only WITHIN one doc survives minDocs=2") {
    val got = run(Seq(
      (1L, "a b c z a b c"),
      (2L, "unrelated text entirely here")), n = 3)
    assert(got(1L) === (("a b c z a b c", 0L)))
  }

  test("a caller whose id column is literally \"id\" resolves unambiguously") {
    val docs = Seq((1L, "x x a b c y y"), (2L, "z a b c w")).toDF("id", "text")
    val got = Dedup.removeRepeatedSpans(docs, "id", col("text"), n = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "x x y y", 2L -> "z w"))
  }

  test("docs shorter than n tokens pass through untouched") {
    val got = run(Seq((1L, "a b"), (2L, "a b")), n = 3)
    assert(got(1L) === (("a b", 0L)))
    assert(got(2L) === (("a b", 0L)))
  }

  test("removal is idempotent on the testdata corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val once = Dedup.removeRepeatedSpans(docs, "doc_id", col("text"), n = 8, minDocs = 2)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = Dedup.removeRepeatedSpans(once, "doc_id", col("text"), n = 8, minDocs = 2)
    // after cutting, no 8-span repeats across docs, so pass 2 is a no-op
    assert(twice.filter(col("n_removed") > 0).count() === 0L)
  }
}

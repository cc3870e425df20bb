package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** Global concat-then-split sequence packing. */
class PackSpec extends GraftSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c"),
    (2L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 tokens: spans a cut at ctx=8
    (3L, "x y"),
    (4L, "p q r s t"),
    (5L, "z")).toDF("doc_id", "text")

  test("the token stream tiles with no gaps or overlaps") {
    val out = TextOps.packSequences(corpus, "doc_id", col("text"), ctxLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // reconstruct global offsets and check contiguity in layout order
    val byStart = out.map { case (id, n, bf, bl, off) => (bf * 8 + off, n, id, bl) }.sortBy(_._1)
    var cursor = 0L
    byStart.foreach { case (start, n, id, bl) =>
      assert(start == cursor, s"doc $id starts at $start, expected $cursor")
      assert(bl == (start + n - 1) / 8, s"doc $id bin_last")
      cursor = start + n
    }
    assert(cursor == out.map(_._2).sum)
  }

  test("a doc longer than the window spans multiple bins") {
    val row = TextOps.packSequences(corpus, "doc_id", col("text"), ctxLen = 8)
      .filter(col("doc_id") === 2L).head()
    assert(row.getLong(1) == 21L) // 20 tokens + 1 EOS
    assert(row.getLong(3) - row.getLong(2) >= 2L)
  }

  test("deterministic across repartitioning") {
    val a = TextOps.packSequences(corpus.repartition(7), "doc_id", col("text"), 8)
      .collect().toSet
    val b = TextOps.packSequences(corpus.coalesce(1), "doc_id", col("text"), 8)
      .collect().toSet
    assert(a === b)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.{Sidecar, Versions}
import graft.pipeline.Retrieval

/** Lexical-index compaction (Retrieval.compactIndex): folding
  * appended segments, tombstones, and counter deltas into a clean
  * layout changes NOTHING a reader can observe (BM25 and phrase,
  * bit-for-bit), drops every overlay, carries the streaming replay
  * markers, and composes with Versions for an atomic flip.
  */
class LexCompactSpec extends GraftSuite {
  import spark.implicits._

  private def docs = graft.sources.Tables(spark, sf001).documents
    .select(col("doc_id"), col("text"))

  private val terms = Seq("slow", "hash", "batch")

  private def bm25(root: String): Seq[(Long, Double, Long)] =
    Retrieval.searchIndex(spark, root, terms, 10)
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq

  private def phrase(root: String): Seq[(Long, Long, Long)] =
    Retrieval.phraseSearchIndex(spark, root, terms)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  /** publish evens + append odds + delete the current top-2. */
  private def lifecycle(root: String): Seq[Long] = {
    Retrieval.publishIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", col("text"), root, buckets = 8)
    Retrieval.appendIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", col("text"), root)
    val victims = Retrieval.searchIndex(spark, root, terms, 2)
      .select("id").as[Long].collect().toSeq
    Retrieval.deleteDocs(spark, root, victims)
    victims
  }

  test("compaction is invisible to readers and drops every overlay") {
    val src = graft.queries.SessionPublish.tempDir("lexcompact") + "/src"
    val dst = graft.queries.SessionPublish.tempDir("lexcompact") + "/dst"
    val victims = lifecycle(src)
    // a streaming replay marker that must survive
    Sidecar.writeString(s"$src/_lex_applied/batch-42", "")

    Retrieval.compactIndex(spark, src, dst)

    assert(bm25(dst) === bm25(src), "compacted BM25 must be bit-identical")
    assert(phrase(dst) === phrase(src), "compacted phrase must be bit-identical")
    assert(Sidecar.listNames(Retrieval.lexTombstonesPath(dst)).isEmpty,
      "tombstones must not survive compaction")
    assert(Sidecar.listNames(Retrieval.countersDir(dst)).isEmpty,
      "counter deltas must fold into the base sidecar")
    assert(Retrieval.readLexMeta(dst) === Retrieval.readLexMeta(src),
      "folded counters must equal the overlay view")
    assert(Sidecar.listNames(s"$dst/_lex_applied").contains("batch-42"),
      "streaming replay markers must be carried")
    val leaked = spark.read.parquet(s"$dst/postings")
      .filter(col("id").isin(victims: _*)).count()
    assert(leaked === 0, "tombstoned ids must not exist in compacted postings")
  }

  test("versioned compaction flips the pointer atomically") {
    val root = graft.queries.SessionPublish.tempDir("lexcompact-v") + "/root"
    Versions.publish(root) { v1 => lifecycle(v1): Unit }
    val before = bm25(Versions.currentPath(root).get)
    val v2 = Retrieval.compactIndexVersioned(spark, root)
    assert(Versions.current(root).contains(v2))
    assert(bm25(Versions.currentPath(root).get) === before)
    assert(Sidecar.listNames(
      Retrieval.lexTombstonesPath(Versions.currentPath(root).get)).isEmpty)
  }

  test("compacting a non-lex layout fails loud") {
    val bogus = graft.queries.SessionPublish.tempDir("lexcompact-bogus") + "/x"
    intercept[IllegalArgumentException] {
      Retrieval.compactIndex(spark, bogus, bogus + "-out")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** Lexical-index takedowns (Retrieval.deleteDocs): deleted index ≡
  * republish without the deleted docs (BM25 and phrase), unseen and
  * repeated deletes are no-ops, and an index without tombstones keeps
  * a join-free read plan.
  */
class LexDeleteSpec extends GraftSuite {
  import spark.implicits._

  private def docs = graft.sources.Tables(spark, sf001).documents
    .select(col("doc_id"), col("text"))

  private val terms = Seq("slow", "hash", "batch")

  private def bm25(root: String): Seq[(Long, Double, Long)] =
    Retrieval.searchIndex(spark, root, terms, 10)
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq

  test("delete == republish-without, for BM25 and phrase, exactly") {
    val root = graft.queries.SessionPublish.tempDir("lexdel") + "/idx"
    Retrieval.publishIndex(docs, "doc_id", col("text"), root, buckets = 8)
    // take down some docs that actually rank for the query
    val victims = Retrieval.searchIndex(spark, root, terms, 3)
      .select("id").as[Long].collect().toSeq
    Retrieval.deleteDocs(spark, root, victims)

    val clean = graft.queries.SessionPublish.tempDir("lexdel-clean") + "/idx"
    Retrieval.publishIndex(docs.filter(!col("doc_id").isin(victims: _*)),
      "doc_id", col("text"), clean, buckets = 8)

    assert(bm25(root) === bm25(clean),
      "deleted index must score like a republish without the victims")
    val phA = Retrieval.phraseSearchIndex(spark, root, terms)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val phB = Retrieval.phraseSearchIndex(spark, clean, terms)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(phA === phB)
    assert(Retrieval.readLexMeta(root)("n").toLong ===
      docs.count() - victims.size, "counters must track the live corpus")
  }

  test("unseen ids and repeated deletes are no-ops") {
    val root = graft.queries.SessionPublish.tempDir("lexdel-noop") + "/idx"
    Retrieval.publishIndex(docs, "doc_id", col("text"), root, buckets = 8)
    val before = Retrieval.readLexMeta(root)
    Retrieval.deleteDocs(spark, root, Seq(999999L, 888888L))
    assert(Retrieval.readLexMeta(root) === before, "unseen ids must be a no-op")
    Retrieval.deleteDocs(spark, root, Seq(1L))
    val after1 = Retrieval.readLexMeta(root)
    Retrieval.deleteDocs(spark, root, Seq(1L))
    assert(Retrieval.readLexMeta(root) === after1,
      "a repeated delete must not double-correct counters")
  }

  test("no tombstones -> no anti-join in the read plan") {
    val root = graft.queries.SessionPublish.tempDir("lexdel-plan") + "/idx"
    Retrieval.publishIndex(docs, "doc_id", col("text"), root, buckets = 8)
    val plan = Retrieval.searchIndex(spark, root, terms, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), "tombstone-free reads must stay join-free")
  }
}

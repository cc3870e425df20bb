package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{LmIndex, TextOps}

/** Published LM counts (pipeline/LmIndex.scala): publish + append ≡
  * full retrain bit-for-bit, kind guard, append token accounting.
  */
class LmIndexSpec extends GraftSuite {
  import spark.implicits._

  test("publish + append scores bit-identically to full retrain") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = graft.queries.SessionPublish.tempDir("lm-spec")
    LmIndex.publish(docs.filter(col("doc_id") % 4 === 0), "doc_id", col("text"), path)
    LmIndex.append(docs.filter(col("doc_id") % 4 === 2), "doc_id", col("text"), path)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val direct = TextOps.stupidBackoffLogProb(
        docs.filter(col("doc_id") % 2 === 0), odd, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaIdx = LmIndex.score(spark, path, odd, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaIdx === direct, "identical micro-nat sums, not approximately")
  }

  test("appended grams change scores (the append is visible)") {
    val path = graft.queries.SessionPublish.tempDir("lm-spec-vis")
    LmIndex.publish(Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", col("text"), path)
    val probe = Seq((9L, "x y z")).toDF("doc_id", "text")
    val before = LmIndex.score(spark, path, probe, "doc_id", col("text"))
      .head().getLong(2)
    LmIndex.append(Seq((2L, "x y z x y z")).toDF("doc_id", "text"), "doc_id", col("text"), path)
    val after = LmIndex.score(spark, path, probe, "doc_id", col("text"))
      .head().getLong(2)
    assert(after > before, s"seen grams must outscore OOV backoff: $after vs $before")
  }

  test("takedown scores bit-identically to a retrain without the removed docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = graft.queries.SessionPublish.tempDir("lm-spec-del")
    LmIndex.publish(docs.filter(col("doc_id") % 2 === 0), "doc_id", col("text"), path)
    LmIndex.delete(docs.filter(col("doc_id") % 4 === 0), "doc_id", col("text"), path)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val direct = TextOps.stupidBackoffLogProb(
        docs.filter(col("doc_id") % 4 === 2), odd, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaIdx = LmIndex.score(spark, path, odd, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaIdx === direct, "identical micro-nat sums after the takedown")
    assert(LmIndex.readMeta(path)("n").toLong ===
      docs.filter(col("doc_id") % 4 === 2)
        .agg(sum(size(split(col("text"), " ")))).head().getLong(0),
      "token total must decrement to the survivors' count")
  }

  test("a fully-removed gram backs off instead of scoring a zero count") {
    val path = graft.queries.SessionPublish.tempDir("lm-spec-del-zero")
    LmIndex.publish(Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", col("text"), path)
    LmIndex.delete(Seq((2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", col("text"), path)
    val probe = Seq((9L, "x y z")).toDF("doc_id", "text")
    val got = LmIndex.score(spark, path, probe, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().toSeq
    val want = TextOps.stupidBackoffLogProb(
        Seq((1L, "a b c")).toDF("doc_id", "text"), probe, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().toSeq
    // a zero-count row surviving the merge would take the seen-gram
    // arm and produce ln(0) = -inf; absence takes the OOV backoff
    assert(got === want, "zeroed grams must be ABSENT, not present-with-zero")
  }

  test("takedown-contract violation fails loud: a negative merged gram count raises") {
    // tombstoning a document the store never indexed drives a gram
    // below zero — impossible under the contract, so scoring must
    // RAISE (CountGuard), never silently back off the gram as absent
    // (which would quietly mis-score every survivor containing it)
    val path = graft.queries.SessionPublish.tempDir("lm-spec-del-neg")
    LmIndex.publish(Seq((1L, "a b c")).toDF("doc_id", "text"),
      "doc_id", col("text"), path)
    LmIndex.delete(Seq((2L, "a a b")).toDF("doc_id", "text"), // never indexed
      "doc_id", col("text"), path)
    val probe = Seq((9L, "a b")).toDF("doc_id", "text")
    val ex = intercept[Exception](
      LmIndex.score(spark, path, probe, "doc_id", col("text")).collect())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(ex).exists(_.contains("takedown contract violated")),
      s"expected the CountGuard contract error, got: ${chain(ex).take(3)}")
  }

  test("compaction drops zeroed-by-takedown segment rows") {
    val src = graft.queries.SessionPublish.tempDir("lm-spec-del-compact") + "/src"
    val dst = graft.queries.SessionPublish.tempDir("lm-spec-del-compact") + "/dst"
    LmIndex.publish(Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", col("text"), src)
    LmIndex.delete(Seq((2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", col("text"), src)
    LmIndex.compact(spark, src, dst)
    val uni = spark.read.parquet(s"$dst/uni").as[(String, Long)].collect().toMap
    assert(uni.keySet === Set("a", "b", "c"), s"zeroed grams must compact away: $uni")
    assert(uni.values.forall(_ > 0))
  }

  test("batch append after a streamed counter delta folds each token exactly once") {
    val path = graft.queries.SessionPublish.tempDir("lm-spec-mixed")
    LmIndex.publish(Seq((1L, "a b c")).toDF("doc_id", "text"),
      "doc_id", col("text"), path) // base n = 3
    // a standing streamed delta (LmStream's counter channel)
    graft.core.Sidecar.writeString(s"${LmIndex.countersDir(path)}/b1", "n=5\n")
    LmIndex.append(Seq((2L, "d e")).toDF("doc_id", "text"),
      "doc_id", col("text"), path) // batch n = 2
    // an append that bumps the delta-FOLDED view would write base 3+5+2
    // and the standing delta file would re-fold to 15
    assert(LmIndex.readMeta(path)("n").toLong === 10L,
      "base 3 + delta 5 + batch 2 — never the delta twice")
    LmIndex.delete(Seq((2L, "d e")).toDF("doc_id", "text"),
      "doc_id", col("text"), path)
    assert(LmIndex.readMeta(path)("n").toLong === 8L,
      "takedown decrements the base; the delta still folds once")
  }

  test("a non-lm sidecar fails loud") {
    val path = graft.queries.SessionPublish.tempDir("lm-spec-kind")
    graft.core.Sidecar.writeProps(s"$path/_lmmeta", Seq("kind" -> "lex", "n" -> "1"))
    val e = intercept[IllegalArgumentException] {
      LmIndex.score(spark, path, Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", col("text"))
    }
    assert(e.getMessage.contains("kind"))
  }

  test("compaction merges segments, folds counters, carries markers, changes no score") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val src = graft.queries.SessionPublish.tempDir("lm-spec-compact") + "/src"
    val dst = graft.queries.SessionPublish.tempDir("lm-spec-compact") + "/dst"
    LmIndex.publish(docs.filter(col("doc_id") % 4 === 0), "doc_id", col("text"), src)
    LmIndex.append(docs.filter(col("doc_id") % 4 === 2), "doc_id", col("text"), src)
    // a streamed counter delta + replay marker that must fold/carry
    graft.core.Sidecar.writeString(s"${LmIndex.countersDir(src)}/b1", "n=5\n")
    graft.core.Sidecar.writeString(s"$src/_lm_applied/b1", "")
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val before = LmIndex.score(spark, src, odd, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

    LmIndex.compact(spark, src, dst)

    val after = LmIndex.score(spark, dst, odd, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after === before, "compaction must not change a single micro-nat")
    assert(LmIndex.readMeta(dst)("n") === LmIndex.readMeta(src)("n"),
      "counter deltas must fold into the base sidecar")
    assert(graft.core.Sidecar.listNames(LmIndex.countersDir(dst)).isEmpty)
    assert(graft.core.Sidecar.listNames(s"$dst/_lm_applied").contains("b1"))
    // segments really merged: one row per distinct unigram
    val uni = spark.read.parquet(s"$dst/uni")
    assert(uni.count() === uni.select("w").distinct().count())
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.BpeTrain
import graft.pipeline.BpeTrain.BpeMerge

/** BPE training conformance: the greedy-merge fold against the
  * two-pointer reference semantics (run edge cases included), the
  * training loop against a hand-computed corpus, deterministic
  * tie-breaks, and the broadcast-vocab tokenization plan.
  */
class BpeTrainSpec extends GraftSuite {
  import spark.implicits._

  private def mergeOf(word: String, lhs: String, rhs: String): Seq[String] =
    Seq(word).toDF("w")
      .select(BpeTrain.applyMerge(BpeTrain.chars(col("w")), lhs, rhs).as("m"))
      .as[Seq[String]].head()

  test("applyMerge is the greedy left-to-right scan, including a=b runs") {
    assert(mergeOf("aaaa", "a", "a") === Seq("aa", "aa"))
    assert(mergeOf("aaa", "a", "a") === Seq("aa", "a"))
    assert(mergeOf("aaaaa", "a", "a") === Seq("aa", "aa", "a"))
    assert(mergeOf("abab", "a", "b") === Seq("ab", "ab"))
    assert(mergeOf("aab", "a", "b") === Seq("a", "ab"))
    assert(mergeOf("ba", "a", "b") === Seq("b", "a"))
    assert(mergeOf("x", "a", "b") === Seq("x"))
  }

  test("merging is symbol-level, not substring-level") {
    // ("aa","a") on raw chars [a,a,a,a]: the SYMBOL "aa" never occurs
    // in a character sequence, so nothing merges — the fold must not
    // treat the rule as a string replace.
    assert(mergeOf("aaaa", "aa", "a") === Seq("a", "a", "a", "a"))
  }

  test("train learns the hand-computed merges of a tiny corpus") {
    // word counts: low x3, lowest x2 -> pairs: (l,o) 5, (o,w) 5,
    // (w,e) 2, (e,s) 2, (s,t) 2. Round 1 tie (l,o) vs (o,w) at 5:
    // lex order picks (l,o). Round 2: (lo,w) 5 beats the rest.
    val docs = Seq("low low lowest", "low lowest").toDF("text")
    val m = BpeTrain.train(docs, col("text"), rounds = 2)
    assert(m.merges === Seq(BpeMerge(1, "l", "o", 5), BpeMerge(2, "lo", "w", 5)))
    val vocab = m.vocab.select(col("word"), col("syms")).as[(String, Seq[String])]
      .collect().toMap
    assert(vocab("low") === Seq("low"))
    assert(vocab("lowest") === Seq("low", "e", "s", "t"))
  }

  test("training stops early when no pairs remain") {
    val docs = Seq("ab ab cd").toDF("text")
    val m = BpeTrain.train(docs, col("text"), rounds = 10)
    // round 1 merges (a,b) cnt 2; round 2 merges (c,d) cnt 1; then
    // every word is a single symbol and training stops at 2 merges.
    assert(m.merges === Seq(BpeMerge(1, "a", "b", 2), BpeMerge(2, "c", "d", 1)))
    assert(m.vocab.where(size(col("syms")) >= 2).count() === 0)
  }

  test("tokenCounts equals re-folding the merges over each document") {
    val docs = Tables(spark, sf0001).documents.limit(100)
    val m = BpeTrain.train(docs, col("text"), rounds = 4)
    val got = BpeTrain.tokenCounts(docs, "doc_id", col("text"), m.vocab)
      .as[(Long, Long)].collect().toMap
    // independent path: fold the merge table over every word in place
    val refold = docs
      .select(col("doc_id"), explode(graft.pipeline.TextOps.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .select(col("doc_id"),
        size(BpeTrain.applyMerges(BpeTrain.chars(col("word")), m.merges)).as("n"))
      .groupBy("doc_id").agg(sum("n").cast("long").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(got === refold)
  }

  test("extend replays the base merges and keeps learning where it left off") {
    // base "low low lowest" (low x2, lowest x1): (l,o) 3 then (lo,w) 3.
    // Extension "wet wet" replays both merges with no effect (no 'lo'),
    // then round 3 counts the union — lowest=[low,e,s,t] x1 +
    // wet=[w,e,t] x2 -> (w,e) 2, (e,t) 2, (e,s) 1, (s,t) 1; the
    // (e,t)/(w,e) tie at 2 lex-breaks to (e,t).
    val base = BpeTrain.train(Seq("low low lowest").toDF("text"), col("text"), 2)
    val full = BpeTrain.extend(base, Seq("wet wet").toDF("text"), col("text"), 1)
    assert(full.merges.map(m => (m.round, m.lhs, m.rhs, m.cnt)) ===
      Seq((1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "t", 2L)))
    val vocab = full.vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(vocab("wet") === Seq("w", "et"))
    assert(vocab("lowest") === Seq("low", "e", "s", "t"))
  }

  test("replayed syms equal freshly trained syms for shared words") {
    // the count-fold in extend assumes word -> syms is a function of
    // the merge table alone; pin it on the real corpus
    val docs = Tables(spark, sf0001).documents
    val base = BpeTrain.train(docs.filter(col("doc_id") % 2 === 0), col("text"), 4)
    val replayed = docs.filter(col("doc_id") % 2 === 1)
      .select(explode(graft.pipeline.TextOps.tokens(col("text"))).as("word"))
      .distinct()
      .select(col("word"),
        BpeTrain.applyMerges(BpeTrain.chars(col("word")), base.merges).as("syms"))
    val clash = replayed.toDF("word", "s2")
      .join(base.vocab.select(col("word"), col("syms")), Seq("word"))
      .filter(col("s2") =!= col("syms")).count()
    assert(clash === 0, "a shared word must tokenize identically on both paths")
  }

  test("segment emits a contiguous 1..N stream consistent with tokenCounts") {
    val docs = Tables(spark, sf0001).documents.limit(50)
    val m = BpeTrain.train(docs, col("text"), rounds = 3)
    val seg = BpeTrain.segment(docs, "doc_id", col("text"), m.vocab)
      .as[(Long, Long, String)].collect()
    val counts = BpeTrain.tokenCounts(docs, "doc_id", col("text"), m.vocab)
      .as[(Long, Long)].collect().toMap
    val byDoc = seg.groupBy(_._1)
    assert(byDoc.keySet === counts.keySet)
    byDoc.foreach { case (d, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps === (1L to counts(d)).toArray.toSeq.toArray.toSeq,
        s"doc $d positions must be contiguous 1..${counts(d)}")
      // every emitted token is a learned symbol: rebuilding the doc's
      // words from the stream must reproduce the original text
      val rebuilt = rows.sortBy(_._2).map(_._3).mkString
      val original = docs.filter(col("doc_id") === d).select("text")
        .head().getString(0).replace(" ", "")
      assert(rebuilt === original, s"doc $d stream must concatenate back")
    }
  }

  test("tokenCounts broadcast-joins the vocab (corpus never shuffles for the join)") {
    val docs = Tables(spark, sf0001).documents
    val m = BpeTrain.train(docs, col("text"), rounds = 2)
    val plan = BpeTrain.tokenCounts(docs, "doc_id", col("text"), m.vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("fertility separates tokenizer-friendly text from gibberish") {
    // train on a corpus where "abab" fully merges; a doc of trained
    // words has fertility 1000 (1 token/word), gibberish stays high
    val train = Seq.fill(20)((0L, "abab")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = BpeTrain.train(train, col("text"), rounds = 3)
    val cands = Seq(
      (100L, "abab abab abab"), // 3 words, 3 tokens → 1000
      (200L, "xqzw vkjp")       // untrained: chars stay split → 4000
    ).toDF("doc_id", "text")
    // unseen words tokenize by replaying the trained merges (the
    // extend/replay path) — segment's vocab must cover the input
    val cvocab = cands
      .select(explode(graft.pipeline.TextOps.tokens(col("text"))).as("word")).distinct()
      .select(col("word"),
        BpeTrain.applyMerges(BpeTrain.chars(col("word")), m.merges).as("syms"))
    val seg = BpeTrain.segment(cands, "doc_id", col("text"), cvocab)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("bpe"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seg(100L) == 3L, s"trained words must be 1 token each: $seg")
    assert(seg(200L) == 8L, s"untrained words stay character-split: $seg")
    // fertility permille: (1000*3) DIV 3 = 1000 vs (1000*8) DIV 2 = 4000
  }

  private def Tables(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.sources.Tables(s, dir)
}

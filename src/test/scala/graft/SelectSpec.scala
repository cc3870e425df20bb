package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Select

/** Data selection operators: DSIR importance resampling and
  * Moore-Lewis cross-entropy difference selection.
  */
class SelectSpec extends GraftSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("id", "text")

  // ---- DSIR ----

  test("dsir: target == raw gives zero weights everywhere, rank by id") {
    val corpus = docs(
      1L -> "a b c", 2L -> "c d e f", 3L -> "g h", 4L -> "a a b", 5L -> "z q w e r")
    val out = Select.dsir(corpus, corpus, corpus, "id", col("text"),
      buckets = 16, keepPermille = 400)
      .orderBy(col("rnk")).collect()
    // ct == cr and nt == nr for every bucket → ln(1) = 0 → all scores 0
    assert(out.forall(_.getLong(2) == 0L))
    // ties broken by id: rank order IS id order
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // (400·5 + 999) DIV 1000 = 2 selected
    assert(out.map(_.getLong(4)).toSeq === Seq(1L, 1L, 0L, 0L, 0L))
  }

  test("dsir: target-like candidates outrank raw-like candidates") {
    // target speaks {alpha beta}, the raw corpus overwhelmingly
    // {noise...}; a candidate made of target vocabulary must score
    // strictly above one made of raw-only vocabulary.
    val target = docs(
      1L -> "alpha beta alpha beta", 2L -> "beta alpha beta alpha")
    val raw = docs(
      (3L to 22L).map(i => i -> "noise filler junk noise filler"): _*)
    val cands = docs(
      100L -> "alpha beta alpha beta",
      200L -> "noise filler junk noise")
    val out = Select.dsir(target, raw, cands, "id", col("text"),
      buckets = 32, keepPermille = 500)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (sIn, rIn, selIn)    = out(100L)
    val (sOut, rOut, selOut) = out(200L)
    assert(sIn > sOut, s"target-like $sIn should beat raw-like $sOut")
    assert(rIn == 1L && rOut == 2L)
    assert(selIn == 1L && selOut == 0L) // keep 500 permille of 2 = 1 doc
  }

  test("dsir: scores are integer dot products of bucket counts and weights") {
    val target = docs(1L -> "x y z")
    val raw    = docs(2L -> "p q r s t u v w")
    val cands  = docs(9L -> "x x y")
    val out = Select.dsir(target, raw, cands, "id", col("text"), buckets = 8)
      .collect()
    assert(out.length == 1)
    // unigrams x,x,y + bigrams "x x","x y" = 5 gram instances
    assert(out.head.getLong(1) == 5L)
  }

  // ---- Moore-Lewis ----

  test("mooreLewis: identical LMs give ml == 0 and select everything") {
    val train = docs(1L -> "a b c a b", 2L -> "c a b c")
    val cands = docs(10L -> "a b c", 11L -> "c b a")
    val out = Select.mooreLewis(train, train, cands, "id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(out.forall { case (_, ml, sel) => ml == 0L && sel == 1L })
  }

  test("mooreLewis: in-domain text is selected, out-of-domain is not") {
    val inDomain = docs(
      1L -> "spark shuffle join spark shuffle join",
      2L -> "join spark shuffle join spark")
    val general = docs(
      (10L to 29L).map(i => i -> "cat dog bird cat dog fish bird"): _*)
    val cands = docs(
      100L -> "spark shuffle join spark",
      200L -> "cat dog bird fish")
    val out = Select.mooreLewis(inDomain, general, cands, "id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    val (mlIn, selIn)   = out(100L)
    val (mlOut, selOut) = out(200L)
    assert(mlIn < 0L && selIn == 1L, s"in-domain candidate ml=$mlIn should be < 0")
    assert(mlOut > 0L && selOut == 0L, s"out-of-domain candidate ml=$mlOut should be > 0")
  }

  // ---- winnowing fingerprints ----

  test("winnow: every full hash window contains a selected position") {
    val (k, w) = (3, 4)
    val doc = docs(1L -> (1 to 40).map(i => s"t${i * 7 % 13}").mkString(" "))
    val sel = graft.pipeline.TextOps.winnow(doc, "id", col("text"), k, w)
      .collect().map(_.getLong(1)).toSet
    val np = 40 - k + 1
    (1 to np - w + 1).foreach { j =>
      assert((j until j + w).exists(sel.contains(_)),
        s"window starting at $j has no selected fingerprint")
    }
  }

  test("winnow: a shared run of >= w+k-1 tokens yields a shared fingerprint") {
    val run = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1
    val two = docs(
      1L -> s"one two three $run four five six",
      2L -> s"nine eight $run seven")
    val out = graft.pipeline.TextOps.winnow(two, "id", col("text"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val f1 = out.filter(_._1 == 1L).map(_._2).toSet
    val f2 = out.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "winnowing guarantee violated: no shared fingerprint")
  }

  test("winnow: short texts fingerprint the whole text once") {
    val out = graft.pipeline.TextOps.winnow(docs(1L -> "just two"), "id", col("text"))
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
  }

  test("mooreLewis: per-token NLLs match the backoff scorer's floors") {
    val inDomain = docs(1L -> "a b a b a")
    val general  = docs(2L -> "c d c d")
    val cands    = docs(5L -> "a b c")
    val row = Select.mooreLewis(inDomain, general, cands, "id", col("text")).head()
    val nllIn  = row.getLong(2)
    val nllGen = row.getLong(3)
    assert(row.getLong(4) == nllIn - nllGen)
    assert(nllIn > 0L && nllGen > 0L) // NLLs are positive micro-nats
  }
}

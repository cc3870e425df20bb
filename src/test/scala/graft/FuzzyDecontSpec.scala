package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** MinHash-LSH fuzzy decontamination: near-dup matches against a
  * benchmark split, integer Jaccard verify.
  */
class FuzzyDecontSpec extends GraftSuite {
  import spark.implicits._

  private val benchText = "the quick brown fox jumps over the lazy dog again and again"
  private def corpus = Seq(
    (50L, benchText),                                              // benchmark (id % 50 == 0)
    (1L, benchText),                                               // exact copy → contaminated
    (2L, "the quick brown fox jumps over the lazy dog again and TWICE"), // light edit → near-dup
    (3L, "completely different text about spark shuffles and joins here"),
    (4L, "the quick brown cat sits under a table with different everything") // one shared shingle only
  ).toDF("doc_id", "text")

  test("exact and lightly-edited benchmark copies are flagged; others are not") {
    val out = Dedup.decontaminateFuzzy(corpus, "doc_id", col("text"),
      col("doc_id") % 50 === 0, minJaccardPermille = 500)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains(1L) && out(1L)._2 == 1000L, s"exact copy must score 1000: $out")
    assert(out.contains(2L) && out(2L)._2 >= 500L && out(2L)._2 < 1000L,
      s"light edit must land in [500,1000): $out")
    assert(!out.contains(3L) && !out.contains(4L),
      s"unrelated / single-shingle docs must not be flagged: $out")
  }

  test("the any-overlap decontaminate flags what fuzzy correctly ranks out") {
    // doc 4 shares shingles with the benchmark ("the quick brown")
    // → the blunt rule flags it, the fuzzy rule does not
    val blunt = Dedup.decontaminate(corpus, "doc_id", col("text"),
      col("doc_id") % 50 === 0).collect().map(_.getLong(0)).toSet
    assert(blunt.contains(4L))
  }

  test("permille threshold is an exact integer cut") {
    // identical 12-token docs share all shingles: u = i → 1000·i >= p·i
    // for any p <= 1000, and max_j_permille = 1000 exactly
    val df = Seq((50L, benchText), (7L, benchText)).toDF("doc_id", "text")
    val out = Dedup.decontaminateFuzzy(df, "doc_id", col("text"),
      col("doc_id") % 50 === 0, minJaccardPermille = 1000).collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L && out.head.getLong(2) == 1000L)
  }
}

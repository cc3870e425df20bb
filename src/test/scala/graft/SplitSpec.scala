package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.sources.Tables

/** Leakage-safe splits: near-dup clusters never straddle the
  * train/test boundary, every doc is routed exactly once, and the
  * routing is deterministic.
  */
class SplitSpec extends GraftSuite {

  test("no near-dup pair straddles the split; every doc routed once") {
    val docs = Tables(spark, sf0001).documents
    val split = Dedup.leakageSafeSplit(docs, "doc_id", col("text"), 0.7, 900)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

    assert(split.size == docs.count(), "one row per doc")
    assert(split.values.map(_._2).toSet == Set("train", "test"),
      "both sides populated at sf0.001")

    val pairs = Dedup.nearDuplicates(docs, "doc_id", col("text"), 0.7)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture sanity: sf0.001 has near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"pair ($a, $b) must share group AND side, got ${split(a)} vs ${split(b)}")
    }

    // unpaired docs are their own group
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    split.foreach { case (id, (grp, _)) =>
      if (!paired.contains(id)) assert(grp == id, s"singleton $id got group $grp")
    }
  }

  test("routing is deterministic across runs") {
    val docs = Tables(spark, sf0001).documents.limit(40)
    def run() = Dedup.leakageSafeSplit(docs, "doc_id", col("text"), 0.7, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run() == run())
  }
}

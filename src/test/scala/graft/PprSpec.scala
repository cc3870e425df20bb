package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Integer fixed-point personalized PageRank: hand-computed scores,
  * frontier locality, and deterministic floor-division mass flow.
  */
class PprSpec extends GraftSuite {
  import spark.implicits._

  private def ppr(edges: Seq[(Long, Long)], seed: Long, rounds: Int): Map[Long, Long] =
    GraphAnalytics.personalizedPageRank(edges.toDF("src", "dst"), seed, rounds)
      .as[(Long, Long)].collect().toMap

  test("hand-computed micro scores on the 3-path") {
    // seed 1, d=0.85: r1 = {1: 150000, 2: 850000}
    assert(ppr(Seq((1L, 2L), (2L, 3L)), 1L, 1) ===
      Map(1L -> 150000L, 2L -> 850000L))
    // r2: node2 splits 850000*850//2000 = 361250 to each side;
    // node1 adds restart 150000 + 361250; node2 gets 150000*850//1000
    assert(ppr(Seq((1L, 2L), (2L, 3L)), 1L, 2) ===
      Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L))
  }

  test("round t only reaches the t-hop frontier") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(ppr(path, 1L, 1).keySet === Set(1L, 2L))
    assert(ppr(path, 1L, 2).keySet === Set(1L, 2L, 3L))
  }

  test("mass never exceeds the injected total (floor only leaks down)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    (1 to 4).foreach { r =>
      val total = ppr(edges, 1L, r).values.sum
      assert(total <= 1000000L, s"round $r total $total exceeds the unit mass")
    }
  }

  test("a seed outside the edge set contributes nothing but fails loud nowhere") {
    val got = ppr(Seq((1L, 2L)), 99L, 2)
    assert(got.isEmpty, "no node ever gains mass from an absent seed")
  }

  private def wppr(edges: Seq[(Long, Long, Long)], seed: Long, rounds: Int): Map[Long, Long] =
    GraphAnalytics.personalizedPageRankWeighted(edges.toDF("src", "dst", "w"), seed, rounds)
      .as[(Long, Long)].collect().toMap

  test("weighted: mass splits by strength, hand-computed") {
    // seed 1, edges 1-2 (w=3), 1-3 (w=1): W(1) = 4
    // node2: floor(1000000*850*3 / (1000*4)) = 637500
    // node3: floor(1000000*850*1 / (1000*4)) = 212500
    assert(wppr(Seq((1L, 2L, 3L), (1L, 3L, 1L)), 1L, 1) ===
      Map(1L -> 150000L, 2L -> 637500L, 3L -> 212500L))
  }

  test("weighted with all-equal weights equals unweighted") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val ew = e.map { case (a, b) => (a, b, 5L) }
    (1 to 3).foreach { r =>
      assert(wppr(ew, 1L, r) === ppr(e, 1L, r), s"round $r diverged")
    }
  }

  test("weighted: non-positive weights fail loudly") {
    val ex = intercept[IllegalArgumentException] {
      wppr(Seq((1L, 2L, 0L)), 1L, 1)
    }
    assert(ex.getMessage.contains("positive"))
  }
}

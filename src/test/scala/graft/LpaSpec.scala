package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Deterministic synchronous LPA: hand-checkable label flows,
  * min-label tie-breaks, undirected/self-loop normalization, and the
  * documented parity behavior on oscillation-prone graphs.
  */
class LpaSpec extends GraftSuite {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    GraphAnalytics.labelPropagation(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("disconnected triangles each converge to their min id in 2 rounds") {
    val got = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)), rounds = 2)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("ties break to the smallest label") {
    // path 1-2-3: node 2 sees labels {1, 3} with equal counts
    val got = lpa(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(got(2L) === 1L)
  }

  test("synchronous single-edge swap (round parity is the contract)") {
    val r1 = lpa(Seq((1L, 2L)), rounds = 1)
    assert(r1 === Map(1L -> 2L, 2L -> 1L), "one synchronous round swaps")
    val r2 = lpa(Seq((1L, 2L)), rounds = 2)
    assert(r2 === Map(1L -> 1L, 2L -> 2L), "two rounds swap back")
  }

  test("directed duplicates and self-loops normalize away") {
    // (2,1) arrives directed + a self-loop + a duplicate reversed edge
    val got = lpa(Seq((2L, 1L), (1L, 2L), (2L, 2L)), rounds = 2)
    assert(got === Map(1L -> 1L, 2L -> 2L),
      "same as the clean single-edge graph at round 2")
  }

  test("majority beats smaller label when counts differ") {
    // After round 1: nodes 20 and 21 (nbrs {50, 9}) carry label 9,
    // node 30 (nbrs {50, 3}) carries label 3. Round 2: center 50
    // sees {9, 9, 3} — the majority 9 must beat the smaller 3.
    val got = lpa(Seq((50L, 20L), (50L, 21L), (50L, 30L),
      (20L, 9L), (21L, 9L), (30L, 3L)), rounds = 2)
    assert(got(50L) === 9L, s"majority label must win, got ${got(50L)}")
  }
}

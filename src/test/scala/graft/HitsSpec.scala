package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Integer-exact HITS (GraphAnalytics.hits): exact replay of the
  * micro-int recurrence on the driver, structural sanity, and
  * determinism.
  */
class HitsSpec extends GraftSuite {
  import spark.implicits._

  //  1 -> {10, 11}, 2 -> {10}, 3 isolated-ish consumer of 11
  private def edges = Seq(
    (1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L)).toDF("src", "dst")

  /** Driver replay of the exact recurrence in hits()'s scaladoc. */
  private def replay(es: Seq[(Long, Long)], rounds: Int): Map[Long, (Long, Long)] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var h = nodes.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      val araw = es.groupBy(_._2).map { case (v, in) => v -> in.map(e => h(e._1)).sum }
      val atot = araw.values.sum
      a = araw.map { case (v, r) => v -> (r * 1000000L) / atot }
      val hraw = es.groupBy(_._1).map { case (u, out) =>
        u -> out.map(e => a.getOrElse(e._2, 0L)).sum
      }
      val htot = hraw.values.sum
      h = hraw.map { case (u, r) => u -> (r * 1000000L) / htot }
    }
    nodes.map(n => n -> (h.getOrElse(n, 0L), a.getOrElse(n, 0L))).toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    GraphAnalytics.hits(df, rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("matches the exact integer replay, rounds 1..3") {
    val es = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L))
    for (rounds <- 1 to 3)
      assert(run(edges, rounds) === replay(es, rounds), s"rounds=$rounds")
  }

  test("structure: broad buyer out-hubs narrow one; popular supplier out-ranks") {
    val got = run(edges, 2)
    assert(got(1L)._1 > got(2L)._1) // 1 points at both authorities
    assert(got(10L)._2 > 0 && got(11L)._2 > 0)
    assert(got(10L)._1 === 0L) // suppliers have no out-edges: hub 0
    assert(got(1L)._2 === 0L) // buyers have no in-edges: authority 0
  }

  test("each side sums to 1e6 minus the deterministic floor leak") {
    val got = run(edges, 2)
    val hs = got.values.map(_._1).sum
    val as = got.values.map(_._2).sum
    assert(hs <= 1000000L && hs > 999990L)
    assert(as <= 1000000L && as > 999990L)
  }

  test("deterministic across repartitioning and duplicate edges") {
    val dup = edges.union(edges) // distinct() inside must collapse these
    assert(run(dup.repartition(7), 2) === run(edges, 2))
  }
}

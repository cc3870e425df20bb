package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Landmark distances, harmonic centrality, SGC feature propagation. */
class CentralitySpec extends GraftSuite {
  import spark.implicits._

  private def micro(x: Double): Long =
    math.round(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)

  test("multiSourceDistances: batched sources equal per-source runs") {
    //    1 -(1)- 2 -(5)- 3      and 1 -(2)- 4 -(1)- 3
    val e = Seq((1L, 2L, 1L), (2L, 3L, 5L), (1L, 4L, 2L), (4L, 3L, 1L))
      .toDF("src", "dst", "w")
    val batched = GraphAnalytics.multiSourceDistances(e, Seq(1L, 3L))._1
      .as[(Long, Long, Long)].collect().toSet
    val solo = Seq(1L, 3L).flatMap { s =>
      GraphAnalytics.shortestPaths(e, s)._1.as[(Long, Long)].collect()
        .map { case (id, d) => (s, id, d) }
    }.toSet
    assert(batched == solo)
    assert(batched((1L, 3L, 3L)), "1 routes around the heavy edge via 4")
  }

  test("harmonicCentrality: path graph center scores highest") {
    // 1 - 2 - 3 - 4 - 5 unit weights, landmarks = all vertices
    val e = (1 to 4).map(i => (i.toLong, i.toLong + 1, 1L)).toDF("src", "dst", "w")
    val (hc, _) = GraphAnalytics.harmonicCentrality(e, Seq(1L, 2L, 3L, 4L, 5L))
    val m = hc.as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // every vertex sees the 4 others
    assert(m.values.forall(_._1 == 4L))
    val h3 = 2 * micro(1.0) + 2 * micro(0.5)
    val h2 = micro(1.0) * 2 + micro(0.5) + micro(1.0 / 3)
    val h1 = micro(1.0) + micro(0.5) + micro(1.0 / 3) + micro(0.25)
    assert(m(3L)._2 == h3 && m(2L)._2 == h2 && m(4L)._2 == h2)
    assert(m(1L)._2 == h1 && m(5L)._2 == h1)
    assert(m(3L)._2 > m(2L)._2 && m(2L)._2 > m(1L)._2, "center > shoulder > end")
  }

  test("harmonicCentrality: unreached vertices and lone landmarks are absent") {
    val e = Seq((1L, 2L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    val (hc, _) = GraphAnalytics.harmonicCentrality(e, Seq(1L))
    val m = hc.as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // component {3,4} unreached; landmark 1 has only its 0 self-distance
    assert(m == Map(2L -> micro(1.0)))
  }

  test("eccentricities: path-graph hand values; bound <= true diameter") {
    val e = (1 to 4).map(i => (i.toLong, i.toLong + 1, 1L)).toDF("src", "dst", "w")
    val (ecc, _) = GraphAnalytics.eccentricities(e, Seq(1L, 3L, 5L))
    val m = ecc.as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // n_reached counts the landmark's own d=0 row too
    assert(m == Map(1L -> ((4L, 5L)), 3L -> ((2L, 5L)), 5L -> ((4L, 5L))))
    // landmark max is a LOWER bound on the diameter, tight here
    assert(m.values.map(_._1).max == 4L)
  }

  test("featurePropagation: triangle plus pendant, 2 hops by hand") {
    // triangle {1,2,3} + pendant 4 on 3; f = id as the feature
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val feats = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "f")
    val rows = GraphAnalytics.featurePropagation(e, feats, hops = 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // f1(v) = sum over N(v) + self
    val f1 = Map(1L -> (1L + 2 + 3), 2L -> (2L + 1 + 3), 3L -> (3L + 1 + 2 + 4), 4L -> (4L + 3))
    assert(rows.view.mapValues(_._2).toMap == f1)
    val f2 = Map(
      1L -> (f1(1L) + f1(2L) + f1(3L)),
      2L -> (f1(2L) + f1(1L) + f1(3L)),
      3L -> (f1(3L) + f1(1L) + f1(2L) + f1(4L)),
      4L -> (f1(4L) + f1(3L)))
    assert(rows.view.mapValues(_._3).toMap == f2)
    assert(rows.view.mapValues(_._1).toMap == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("featurePropagation: missing features propagate 0; non-graph ids drop") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val feats = Seq((1L, 10L), (99L, 7L)).toDF("id", "f")
    val rows = GraphAnalytics.featurePropagation(e, feats, hops = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L, 10L), (2L, 0L, 10L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Link prediction, degree assortativity, weighted shortest paths. */
class LinkPredictionSpec extends GraftSuite {
  import spark.implicits._

  private def micro(x: Double): Long =
    math.round(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)

  test("linkPrediction: path a-b-c scores (a,c); complete graphs score nothing") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rows = GraphAnalytics.linkPrediction(path, maxCenterDegree = 100)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // only candidate: (1, 3) through center 2 (deg 2)
    assert(rows == Seq((1L, 3L, 1L, micro(1.0 / math.log(2.0)), micro(1.0))))

    val k4 = (for (i <- 1 to 4; j <- 1 to 4 if i != j) yield (i.toLong, j.toLong))
      .toDF("src", "dst")
    assert(GraphAnalytics.linkPrediction(k4, 100).count() == 0, "no non-adjacent pairs")
  }

  test("linkPrediction: scores on two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: the only non-adjacent pair is (1,4), with
    // common neighbors {2, 3} (deg 3 each); deg(1) = deg(4) = 2
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val rows = GraphAnalytics.linkPrediction(e, 100)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val aaTerm = micro(1.0 / math.log(3.0))
    assert(rows == Seq((1L, 4L, 2L, 2 * aaTerm, micro(2.0 / (2 + 2 - 2)))))
  }

  test("linkPrediction: the center-degree cap drops hub-mediated candidates") {
    val star = (2 to 10).map(i => (1L, i.toLong)).toDF("src", "dst")
    // hub degree 9: all 36 leaf pairs are hub-mediated candidates
    assert(GraphAnalytics.linkPrediction(star, maxCenterDegree = 9).count() == 36)
    assert(GraphAnalytics.linkPrediction(star, maxCenterDegree = 8).count() == 0)
  }

  test("assortativity: star is -1, regular graphs are 0 by convention") {
    val path3 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = GraphAnalytics.assortativity(path3).as[(Long, Long)].head()
    assert(p == ((4L, -1000000L)), "path of 3 is perfectly disassortative")

    val star = (2 to 10).map(i => (1L, i.toLong)).toDF("src", "dst")
    val s = GraphAnalytics.assortativity(star).as[(Long, Long)].head()
    assert(s == ((18L, -1000000L)))

    val cycle = (1 to 5).map(i => (i.toLong, (i % 5 + 1).toLong)).toDF("src", "dst")
    val c = GraphAnalytics.assortativity(cycle).as[(Long, Long)].head()
    assert(c == ((10L, 0L)), "2-regular: zero degree variance -> 0")
  }

  test("shortestPaths: weighted square routes around the heavy edge") {
    //    1 -(1)- 2 -(5)- 3      and 1 -(2)- 4 -(1)- 3
    val e = Seq((1L, 2L, 1L), (2L, 3L, 5L), (1L, 4L, 2L), (4L, 3L, 1L))
      .toDF("src", "dst", "w")
    val (dist, rounds) = GraphAnalytics.shortestPaths(e, source = 1L)
    val d = dist.as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 2L))
    assert(rounds >= 2, "3 is two hops from the source")
  }

  test("shortestPaths: unreachable vertices are absent; undirected edges relax both ways") {
    val e = Seq((1L, 2L, 3L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    val d = GraphAnalytics.shortestPaths(e, source = 2L)._1.as[(Long, Long)].collect().toMap
    assert(d == Map(2L -> 0L, 1L -> 3L), "component {3,4} unreachable; 2->1 uses the reverse edge")
  }

  test("shortestPaths: negative weights fail loudly") {
    val e = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      GraphAnalytics.shortestPaths(e, source = 1L)
    }
    assert(ex.getMessage.contains("positive"))
  }
}

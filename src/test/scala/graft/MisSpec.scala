package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Maximal independent set: independence, maximality, determinism. */
class MisSpec extends GraftSuite {
  import spark.implicits._

  private def misOf(edges: Seq[(Long, Long)]): Set[Long] =
    GraphAnalytics.maximalIndependentSet(edges.toDF("src", "dst"))._1
      .as[Long].collect().toSet

  private def checkMis(edges: Seq[(Long, Long)], mis: Set[Long]): Unit = {
    val und = edges.flatMap(e => Seq(e, e.swap)).toSet
    edges.foreach { case (a, b) =>
      assert(!(mis(a) && mis(b)), s"edge ($a, $b) inside the MIS")
    }
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).toSet
    (vertices -- mis).foreach { v =>
      assert(und.exists { case (x, y) => x == v && mis(y) },
        s"non-member $v has no MIS neighbor (not maximal)")
    }
    assert(mis.subsetOf(vertices))
  }

  test("star: MIS is the hub alone or all leaves; independent + maximal") {
    val star = (2 to 8).map(i => (1L, i.toLong))
    val mis = misOf(star)
    checkMis(star, mis)
    assert(mis == Set(1L) || mis == (2 to 8).map(_.toLong).toSet)
  }

  test("path and triangle fixtures are independent + maximal") {
    val path = (1 to 6).map(i => (i.toLong, i.toLong + 1))
    checkMis(path, misOf(path))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val m = misOf(tri)
    checkMis(tri, m)
    assert(m.size == 1, "a triangle's MIS is a single vertex")
  }

  test("two disjoint edges: one endpoint from each") {
    val e = Seq((1L, 2L), (10L, 11L))
    val m = misOf(e)
    checkMis(e, m)
    assert(m.size == 2)
  }

  test("deterministic across runs") {
    val edges = (1 to 30).map(i => (i.toLong, (i * 7 % 31 + 1).toLong))
      .filter(e => e._1 != e._2)
    assert(misOf(edges) == misOf(edges))
  }

  test("empty edge set yields empty MIS, zero rounds") {
    val (mis, rounds) = GraphAnalytics.maximalIndependentSet(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(mis.count() == 0 && rounds == 0)
  }
}

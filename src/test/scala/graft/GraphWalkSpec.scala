package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Deterministic DeepWalk corpus: walks are valid paths, complete,
  * reproducible, and genuinely hash-driven (not argmin-of-id).
  */
class GraphWalkSpec extends GraftSuite {
  import spark.implicits._

  private val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))

  private def walks(len: Int): Seq[(Long, Long, Long)] =
    GraphAnalytics.deterministicWalks(edges.toDF("src", "dst"), len)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("every node walks exactly walkLen steps along real edges") {
    val ws = walks(4)
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val byStart = ws.groupBy(_._1)
    assert(byStart.keySet === Set(1L, 2L, 3L, 4L, 5L))
    byStart.foreach { case (s, rows) =>
      assert(rows.map(_._2) === (0L to 4L), s"start $s must have steps 0..4")
      assert(rows.head._3 === s, "step 0 is the start")
      rows.map(_._3).sliding(2).foreach { case Seq(a, b) =>
        assert(und.contains((a, b)), s"hop $a->$b must be an edge")
      }
    }
  }

  test("walks are reproducible run-to-run") {
    assert(walks(3) === walks(3))
  }

  test("skipGramPairs emits exactly the window-bounded pairs") {
    val walks = GraphAnalytics.deterministicWalks(edges.toDF("src", "dst"), 4)
    val pairs = GraphAnalytics.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long, Long)].collect()
    val stream = walks.as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val expected = stream.flatMap { case (s, seq) =>
      for {
        i <- seq.indices; j <- seq.indices
        if i != j && math.abs(i - j) <= 2
      } yield (s, i.toLong, seq(i), seq(j))
    }.toSet
    assert(pairs.toSet === expected)
    // 5 positions, window 2 -> 2+3+4+3+2 = 14 ordered pairs per walk
    assert(pairs.length === 5 * 14)
  }

  test("the hash actually drives the choice (not min neighbor id)") {
    // node 3's neighbors are {1, 2, 4}: across starts/steps at least
    // one hop out of 3 must pick a neighbor other than 1 — if every
    // such hop picked the min id, the hash would be dead code.
    val hopsFrom3 = walks(4).groupBy(_._1).values.flatMap { rows =>
      rows.map(_._3).sliding(2).collect { case Seq(3L, b) => b }
    }.toSet
    assert(hopsFrom3.exists(_ != 1L), s"hops from 3 all chose min id: $hopsFrom3")
  }
}

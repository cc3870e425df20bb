package graft

import org.apache.spark.sql.functions._

import graft.core.GraphBuilder
import graft.operators.Motif
import graft.operators.Motif.Hop

/** Chain-pattern matching over the movies-style fixture. */
class MotifSpec extends GraftSuite {

  private lazy val g = {
    val b = new GraphBuilder
    val th = b.addNode("Actor")
    val fg = b.addNode("Movie")
    val st = b.addNode("Studio")
    val sl = b.addNode("Movie")
    b.addEdge(th, fg, "played")
    b.addEdge(th, sl, "played")
    b.addEdge(fg, st, "made_by")
    b.snapshot(spark)
  }

  test("2-hop chain binds node and edge aliases per path") {
    val rows = Motif.paths(g, Seq(
      Hop(relLabel = Some("played")), Hop(relLabel = Some("made_by"))))
      .select("n0", "n1", "n2").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq(1L, 2L, 3L)), "only Hanks->Gump->Studio chains")
  }

  test("label constraints filter on the edge scan; wildcard hop matches all") {
    assert(Motif.paths(g, Seq(Hop())).count() == 3, "single wildcard hop = all edges")
    assert(Motif.paths(g, Seq(Hop(dstLabel = Some("Movie")))).count() == 2)
    assert(Motif.paths(g, Seq(
      Hop(srcLabel = Some("Actor")), Hop(relLabel = Some("played")))).count() == 0,
      "no played edge leaves a Movie")
  }

  test("deleted edges leave the pattern (live view)") {
    val g2 = g.deleteEdges(col("label") === "made_by", 1L)
    assert(Motif.paths(g2, Seq(Hop(Some("played")), Hop(Some("made_by")))).count() == 0)
  }

  test("duplicate paths are preserved (one row per edge sequence)") {
    val b = new GraphBuilder
    val a = b.addNode("t"); val c = b.addNode("t"); val d = b.addNode("t")
    b.addEdge(a, c, "r"); b.addEdge(a, c, "r") // parallel edges
    b.addEdge(c, d, "r")
    val paths = Motif.paths(b.snapshot(spark), Seq(Hop(Some("r")), Hop(Some("r"))))
    assert(paths.count() == 2, "two parallel first edges = two distinct paths")
  }
}

package graft

import graft.core.GraphBuilder
import graft.model.PropertyValue._
import graft.operators.Traversal
import graft.operators.Traversal._

/** Conformance with the STMGraph traversal spec
  * (STMGraph/test/.../APISpec.hs:170-389, FIXTURES.md §2).
  * Results compared as multisets — the reference's reverse-insertion
  * ordering is a storage artifact (SURVEY §2.6).
  */
class TraversalSpec extends GraftSuite {

  // 3 nodes of type1 (nm/cnt), edges ref1/ref2 with weight, as in
  // APISpec.hs:391-401 shorthands.
  private lazy val fx = {
    val b  = new GraphBuilder
    val o1 = b.addNode("type1", Map("nm" -> Seq(PVText("obj1")), "cnt" -> Seq(PVInteger(1))))
    val o2 = b.addNode("type1", Map("nm" -> Seq(PVText("obj2")), "cnt" -> Seq(PVInteger(2))))
    val o3 = b.addNode("type2", Map("nm" -> Seq(PVText("obj3")), "cnt" -> Seq(PVInteger(3))))
    val e1 = b.addEdge(o1, o2, "ref1", Map("weight" -> Seq(PVInteger(10))))
    val e2 = b.addEdge(o1, o3, "ref2", Map("weight" -> Seq(PVInteger(20))))
    val e3 = b.addEdge(o2, o1, "ref1", Map("weight" -> Seq(PVInteger(30))))
    (b.snapshot(spark), o1, o2, o3, e1, e2, e3)
  }

  private def nodeIds(r: TraversalResult): Seq[Long] =
    r.df.select("id").collect().map(_.getLong(0)).toSeq

  test("NID filters; missing id dropped; nonexistent -> empty") {
    val (g, o1, o2, _, _, _, _) = fx
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1, o2)))))).sorted == Seq(o1, o2))
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1, 999L)))))).sorted == Seq(o1))
    assert(Traversal.run(g, Composed(Seq(Ns, NID(Seq(999L))))).df.count() == 0)
  }

  test("Has on typed values: text and integer; unknown -> empty") {
    val (g, o1, _, _, _, _, _) = fx
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, Has("nm", PVText("obj1")))))) == Seq(o1))
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, Has("cnt", PVInteger(1)))))) == Seq(o1))
    // typed equality: text "1" is NOT integer 1
    assert(Traversal.run(g, Composed(Seq(Ns, Has("cnt", PVText("1"))))).df.count() == 0)
    assert(Traversal.run(g, Composed(Seq(Ns, Has("nm", PVText("zzz"))))).df.count() == 0)
  }

  test("Has on edges via Es") {
    val (g, _, _, _, e1, _, _) = fx
    val r = Traversal.run(g, Composed(Seq(Es, Has("weight", PVInteger(10)))))
    assert(r.df.select("id").collect().map(_.getLong(0)).toSeq == Seq(e1))
  }

  test("Out with named type / wildcard / unknown / EMPTY list") {
    val (g, o1, o2, o3, _, _, _) = fx
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), Out(Seq("ref1")))))) == Seq(o2))
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), Out(Seq("*")))))).sorted == Seq(o2, o3))
    assert(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), Out(Seq("nope"))))).df.count() == 0)
    // EMPTY type list -> Empty, stricter than queryStep (API.hs:314-339)
    val r = Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), Out(Nil))))
    assert(r.kind == "empty" && r.df.count() == 0)
  }

  test("In and Both; Both preserves duplicates (APISpec:386-389)") {
    val (g, o1, o2, o3, _, _, _) = fx
    assert(nodeIds(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), In(Seq("*")))))) == Seq(o2))
    // o1 Both(*): In gives o2 (from e3), Out gives o2 (e1), o3 (e2) — o2 twice
    val both = nodeIds(Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), Both(Seq("*"))))))
    assert(both.sorted == Seq(o2, o2, o3).sorted)
  }

  test("OutE/InE/BothE edge traversals") {
    val (g, o1, _, _, e1, e2, e3) = fx
    def edgeIds(t: Traversal) = Traversal.run(g, t).df.select("id").collect().map(_.getLong(0)).toSeq
    assert(edgeIds(Composed(Seq(Ns, NID(Seq(o1)), OutE(Seq("*"))))).sorted == Seq(e1, e2))
    assert(edgeIds(Composed(Seq(Ns, NID(Seq(o1)), InE(Seq("ref1"))))) == Seq(e3))
    assert(edgeIds(Composed(Seq(Ns, NID(Seq(o1)), BothE(Seq("*"))))).sorted == Seq(e1, e2, e3))
  }

  test("Values: requested names only; unknown names -> no value rows; entity kept") {
    val (g, o1, _, _, _, _, _) = fx
    val r = Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1)), Values(Seq("nm", "bogus")))))
    assert(r.kind == "properties")
    val rows = r.df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "nm")
    assert(rows.head.getAs[String]("vText") == "obj1")
  }

  test("AllValues: union of all names") {
    val (g, o1, o2, _, _, _, _) = fx
    val r = Traversal.run(g, Composed(Seq(Ns, NID(Seq(o1, o2)), AllValues)))
    val names = r.df.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("nm", "cnt"))
  }

  test("multi-valued properties round-trip through Values") {
    val b  = new GraphBuilder
    val n1 = b.addNode("t", Map("tags" -> Seq(PVText("a"), PVText("b"), PVInteger(7))))
    val g  = b.snapshot(spark)
    val r  = Traversal.run(g, Composed(Seq(Ns, NID(Seq(n1)), Values(Seq("tags")))))
    val rows = r.df.orderBy("seq").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Int]("seq")).toSeq == Seq(0, 1, 2))
    assert(rows(0).getAs[String]("vText") == "a")
    assert(rows(2).getAs[java.math.BigDecimal]("vInt").longValueExact() == 7L)
  }

  test("illegal step/state combo raises (SError analog)") {
    val (g, _, _, _, _, _, _) = fx
    intercept[Traversal.TraversalException] {
      Traversal.run(g, Composed(Seq(Es, Out(Seq("*")))))
    }
  }
}

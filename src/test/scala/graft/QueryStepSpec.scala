package graft

import org.apache.spark.sql.functions._

import graft.core.GraphBuilder
import graft.model.PropertyValue._
import graft.operators.QueryStep
import graft.operators.QueryStep.{RelationStep, IN, OUT, BOTH}

/** Conformance with HGraphStorage QueryTest.hs:17-52 on the movies
  * graph (FIXTURES.md §1): directions, per-direction counts, and
  * limit-returns-newest.
  */
class QueryStepSpec extends GraftSuite {

  private lazy val fixture = {
    val b = new GraphBuilder
    val th = b.addNode("Actor", Map("name" -> Seq(PVText("Tom Hanks")), "age" -> Seq(PVInteger(60))))
    val fg = b.addNode("Movie", Map("name" -> Seq(PVText("Forrest Gump")), "year" -> Seq(PVInteger(1990))))
    val ss = b.addNode("Movie", Map("name" -> Seq(PVText("Sleepless in Seattle")), "year" -> Seq(PVInteger(1990))))
    val e1 = b.addEdge(th, fg, "Played", Map("role" -> Seq(PVText("Forrest Gump"))))
    val e2 = b.addEdge(th, ss, "Played", Map("role" -> Seq(PVText("Sam Baldwin"))))
    (b.snapshot(spark), th, fg, ss, e1, e2)
  }

  test("OUT from Tom Hanks returns both movies") {
    val (g, th, fg, ss, _, _) = fixture
    val rows = QueryStep.fromIds(g, Seq(th), RelationStep(direction = OUT)).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("tgt_id")).toSet == Set(fg, ss))
    assert(rows.forall(_.getAs[String]("rel_label") == "Played"))
    assert(rows.forall(_.getAs[String]("direction") == "OUT"))
    assert(rows.forall(_.getAs[String]("tgt_label") == "Movie"))
  }

  test("IN to Tom Hanks is empty; IN to Forrest Gump is Tom Hanks") {
    val (g, th, fg, _, _, _) = fixture
    assert(QueryStep.fromIds(g, Seq(th), RelationStep(direction = IN)).count() == 0)
    val rows = QueryStep.fromIds(g, Seq(fg), RelationStep(direction = IN)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("tgt_id") == th)
    assert(rows.head.getAs[String]("direction") == "IN")
  }

  test("BOTH from Tom Hanks = OUT ++ IN = 2") {
    val (g, th, _, _, _, _) = fixture
    assert(QueryStep.fromIds(g, Seq(th), RelationStep(direction = BOTH)).count() == 2)
  }

  test("limit 1 returns the NEWEST edge (QueryTest.hs:49-50)") {
    val (g, th, _, ss, _, e2) = fixture
    val rows = QueryStep.fromIds(g, Seq(th), RelationStep(direction = OUT, limit = Some(1))).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("rel_id") == e2, "newest = last created")
    assert(rows.head.getAs[Long]("tgt_id") == ss)
  }

  test("relation-type and target-type filters restrict on edge scan") {
    val (g, th, _, _, _, _) = fixture
    assert(QueryStep.fromIds(g, Seq(th), RelationStep(relTypes = Seq("Nope"))).count() == 0)
    assert(QueryStep.fromIds(g, Seq(th), RelationStep(tgtTypes = Seq("Movie"))).count() == 2)
    assert(QueryStep.fromIds(g, Seq(th), RelationStep(tgtTypes = Seq("Actor"))).count() == 0)
  }

  test("tgtFilter arbitrary predicate over target props") {
    val (g, th, fg, _, _, _) = fixture
    val pred = graft.model.PropValues.hasValue(col("tgt_props"), "name", PVText("Forrest Gump"))
    val rows = QueryStep.fromIds(g, Seq(th), RelationStep(tgtFilter = Some(pred))).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("tgt_id") == fg)
  }

  test("limit counts MATCHING results: filter applies before the limit (Query.hs:63-64)") {
    val (g, th, fg, _, e1, _) = fixture
    // newest edge targets Sleepless in Seattle; with a filter matching
    // only Forrest Gump, limit 1 must return the FG edge, not nothing
    val pred = graft.model.PropValues.hasValue(col("tgt_props"), "name", PVText("Forrest Gump"))
    val rows = QueryStep.fromIds(g, Seq(th),
      RelationStep(tgtFilter = Some(pred), limit = Some(1))).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("tgt_id") == fg && rows.head.getAs[Long]("rel_id") == e1)
  }

  test("tgtPredicate: an arbitrary host closure (set lookup) == the Column path") {
    val (g, th, fg, ss, _, _) = fixture
    import QueryStep.TargetNode
    // a host-side lookup table no Column expression can reference
    val allowed: Set[String] = Set("Forrest Gump", "Apollo 13")
    val byClosure = QueryStep.fromIds(g, Seq(th), RelationStep(
      tgtPredicate = Some((n: TargetNode) => n.props.getOrElse("name", Nil).exists {
        case PVText(s) => allowed.contains(s)
        case _         => false
      }))).collect()
    val byColumn = QueryStep.fromIds(g, Seq(th), RelationStep(
      tgtFilter = Some(graft.model.PropValues.hasValue(col("tgt_props"), "name",
        PVText("Forrest Gump"))))).collect()
    assert(byClosure.map(_.toSeq).toSet === byColumn.map(_.toSeq).toSet)
    assert(byClosure.length == 1 && byClosure.head.getAs[Long]("tgt_id") == fg)

    // the closure sees the FULL populated object: id, label, typed props
    val all = QueryStep.fromIds(g, Seq(th), RelationStep(
      tgtPredicate = Some((n: TargetNode) =>
        n.label == "Movie" && n.id == ss &&
          n.props("year").contains(PVInteger(1990))))).collect()
    assert(all.length == 1 && all.head.getAs[Long]("tgt_id") == ss)
  }

  test("tgtPredicate composes with limit: filter before limit, newest kept") {
    val (g, th, fg, _, e1, _) = fixture
    import QueryStep.TargetNode
    val rows = QueryStep.fromIds(g, Seq(th), RelationStep(
      tgtPredicate = Some((n: TargetNode) => n.props.getOrElse("name", Nil).exists {
        case PVText(s) => s.startsWith("Forrest")
        case _         => false
      }),
      limit = Some(1))).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("tgt_id") == fg && rows.head.getAs[Long]("rel_id") == e1)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.{GraphBuilder, IndexedGraph}
import graft.model.PropertyValue._
import graft.model.PropValues._
import graft.operators.UniqueIndex.{DuplicateIndexKeyException, IndexInfo}

/** Incremental index maintenance on mutation — the reference's
  * APITest.hs:128-174 ("Indexing one object" / "Indexing two
  * objects") plus the diff cases of removeOldValuesFromIndex
  * (API.hs:184-238): same values → no-op, removed → stale entry gone,
  * added → inserted, clash with another owner → DuplicateIndexKey.
  */
class IndexMaintenanceSpec extends GraftSuite {

  private val idxInfo = IndexInfo("LastName", Seq("Actor"), "lastName")

  private def entries(ig: IndexedGraph): Set[(String, Long)] =
    ig.indexes(idxInfo).select("key", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("indexing one object: create, update, delete (APITest.hs:128-140)") {
    val b  = new GraphBuilder
    val th = b.addNode("Actor",
      Map("firstName" -> Seq(PVText("Tom")), "lastName" -> Seq(PVText("Hanks"))))
    val ig0 = IndexedGraph(b.snapshot(spark), Map.empty).withIndex(idxInfo)
    assert(entries(ig0) == Set("Hanks" -> th))

    // updateObject replaces the whole property map (API.hs:170-180)
    val ig1 = ig0.updateNodeProps(col("id") === th, 1L,
      _ => propsMap("firstName" -> pvText(lit("Tom")), "lastName" -> pvText(lit("Cruise"))))
    assert(entries(ig1) == Set("Cruise" -> th), "old key removed, new inserted, same owner")
    val lastNames = ig1.graph.live.nodes.filter(col("id") === th)
      .select(explode(col("props").getItem("lastName")).as("v"))
      .select(col("v.vText")).collect().map(_.getString(0)).toSeq
    assert(lastNames == Seq("Cruise"), "the graph reflects the COW update")

    val ig2 = ig1.deleteNodes(col("id") === th, 2L)
    assert(entries(ig2).isEmpty, "delete removes the entry (allIdx3 = [])")
    assert(ig2.graph.live.nodes.filter(col("id") === th).count() == 0)
  }

  test("indexing two objects: deleting one leaves the other (APITest.hs:141-157)") {
    val b  = new GraphBuilder
    val th = b.addNode("Actor", Map("lastName" -> Seq(PVText("Hanks"))))
    val tc = b.addNode("Actor", Map("lastName" -> Seq(PVText("Cruise"))))
    val ig = IndexedGraph(b.snapshot(spark), Map.empty).withIndex(idxInfo)
    assert(entries(ig) == Set("Hanks" -> th, "Cruise" -> tc))
    assert(entries(ig.deleteNodes(col("id") === th, 1L)) == Set("Cruise" -> tc))
  }

  test("duplicate check: stealing another live owner's key raises (API.hs:217-229)") {
    val b  = new GraphBuilder
    val th = b.addNode("Actor", Map("lastName" -> Seq(PVText("Hanks"))))
    b.addNode("Actor", Map("lastName" -> Seq(PVText("Cruise"))))
    val ig = IndexedGraph(b.snapshot(spark), Map.empty).withIndex(idxInfo)
    intercept[DuplicateIndexKeyException] {
      ig.updateNodeProps(col("id") === th, 1L,
        _ => propsMap("lastName" -> pvText(lit("Cruise"))))
    }
  }

  test("duplicate check: two updates adding the same key in one tx raise") {
    val b = new GraphBuilder
    b.addNode("Actor", Map("lastName" -> Seq(PVText("Hanks"))))
    b.addNode("Actor", Map("lastName" -> Seq(PVText("Cruise"))))
    val ig = IndexedGraph(b.snapshot(spark), Map.empty).withIndex(idxInfo)
    intercept[DuplicateIndexKeyException] {
      ig.updateNodeProps(col("label") === "Actor", 1L,
        _ => propsMap("lastName" -> pvText(lit("Smith"))))
    }
  }

  test("no-op diff: unchanged indexed values cause no churn and no false duplicate") {
    val b  = new GraphBuilder
    val th = b.addNode("Actor",
      Map("firstName" -> Seq(PVText("Tom")), "lastName" -> Seq(PVText("Hanks"))))
    val ig = IndexedGraph(b.snapshot(spark), Map.empty).withIndex(idxInfo)
    // keeping lastName = Hanks while changing firstName is the
    // removeIdx `ovs == nvs` case: no remove, no add, no dup check hit
    val ig1 = ig.updateNodeProps(col("id") === th, 1L,
      _ => propsMap("firstName" -> pvText(lit("Thomas")), "lastName" -> pvText(lit("Hanks"))))
    assert(entries(ig1) == Set("Hanks" -> th))
  }

  test("multi-valued property: dropping one value removes only its entry") {
    val b  = new GraphBuilder
    val th = b.addNode("Actor",
      Map("lastName" -> Seq(PVText("Hanks"), PVText("Coppola"))))
    val ig = IndexedGraph(b.snapshot(spark), Map.empty).withIndex(idxInfo)
    assert(entries(ig) == Set("Hanks" -> th, "Coppola" -> th))
    val ig1 = ig.updateNodeProps(col("id") === th, 1L,
      _ => propsMap("lastName" -> pvText(lit("Hanks"))))
    assert(entries(ig1) == Set("Hanks" -> th))
  }

  test("edge delete leaves nodes and node indexes untouched") {
    val b  = new GraphBuilder
    val th = b.addNode("Actor", Map("lastName" -> Seq(PVText("Hanks"))))
    val fg = b.addNode("Movie", Map("title" -> Seq(PVText("Forrest Gump"))))
    b.addEdge(th, fg, "acted_in")
    val g  = b.snapshot(spark)
    val g2 = g.deleteEdges(col("label") === "acted_in", 1L)
    assert(g2.live.edges.count() == 0)
    assert(g2.live.nodes.count() == 2)
  }
}

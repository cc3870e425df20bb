package graft

import org.apache.spark.sql.functions._

import graft.core.GraphBuilder
import graft.model.PropertyValue._
import graft.operators.UniqueIndex
import graft.operators.UniqueIndex.{DuplicateIndexKeyException, IndexInfo}

/** Index semantics from HGraphStorage APITest.hs:128-174 /
  * IndexTest.hs — build, label scoping, uniqueness, lookup, prefix.
  */
class UniqueIndexSpec extends GraftSuite {

  private lazy val g = {
    val b = new GraphBuilder
    b.addNode("Actor", Map("lastName" -> Seq(PVText("Hanks"))))
    b.addNode("Actor", Map("lastName" -> Seq(PVText("Fishburne"))))
    b.addNode("Movie", Map("lastName" -> Seq(PVText("Hanks")))) // different label, same key
    b.addNode("Actor", Map.empty) // no property -> not indexed
    b.snapshot(spark)
  }

  test("build is label-scoped (isIndexApplicable) and skips missing props") {
    val idx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Seq("Actor"), "lastName"))
    assert(idx.count() == 2)
    assert(idx.select("key").collect().map(_.getString(0)).toSet == Set("Hanks", "Fishburne"))
  }

  test("requireUnique passes on unique keys, raises on duplicates") {
    val actorIdx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Seq("Actor"), "lastName"))
    UniqueIndex.requireUnique(actorIdx, Seq("key")) // no throw
    val allIdx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Nil, "lastName"))
    intercept[DuplicateIndexKeyException] {
      UniqueIndex.requireUnique(allIdx, Seq("key"))
    }
  }

  test("lookup and prefix") {
    val idx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Seq("Actor"), "lastName"))
    assert(UniqueIndex.lookup(idx, "Hanks").count() == 1)
    assert(UniqueIndex.lookup(idx, "Nope").count() == 0)
    assert(UniqueIndex.prefix(idx, "Fish").count() == 1)
    assert(UniqueIndex.prefix(idx, "H").count() == 1)
    assert(UniqueIndex.prefix(idx, "Z").count() == 0)
  }

  test("multi-valued properties index every value") {
    val b = new GraphBuilder
    val n = b.addNode("Actor", Map("lastName" -> Seq(PVText("Hanks"), PVText("Wilson"))))
    val idx = UniqueIndex.build(b.snapshot(spark).nodes,
      IndexInfo("LastName", Seq("Actor"), "lastName"))
    val keys = idx.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(keys == Set(("Hanks", n), ("Wilson", n)))
  }

  test("prefixRange matches startsWith semantics") {
    val idx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Seq("Actor"), "lastName"))
    val viaRange = idx.filter(UniqueIndex.prefixRange(col("key"), "Fish")).count()
    assert(viaRange == 1)
  }
}

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
    UniqueIndex.requireUnique(actorIdx, Seq("vType", "key")) // no throw
    val allIdx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Nil, "lastName"))
    intercept[DuplicateIndexKeyException] {
      UniqueIndex.requireUnique(allIdx, Seq("vType", "key"))
    }
  }

  test("typed keys: repeated value = one entry; int and text keys distinct") {
    val b = new GraphBuilder
    val n1 = b.addNode("T", Map("k" -> Seq(PVText("Hanks"), PVText("Hanks"), PVInteger(42))))
    val n2 = b.addNode("T", Map("k" -> Seq(PVText("42"))))
    val idx = UniqueIndex.build(b.snapshot(spark).nodes, IndexInfo("K", Seq("T"), "k"))
    // dup value on one owner -> single entry -> no false duplicate
    UniqueIndex.requireUnique(idx, Seq("vType", "key"))
    assert(idx.count() == 3)
    assert(UniqueIndex.lookupValue(idx, PVInteger(42)).collect().map(_.getAs[Long]("id")).toSeq == Seq(n1))
    assert(UniqueIndex.lookup(idx, "42").collect().map(_.getAs[Long]("id")).toSeq == Seq(n2),
      "text '42' and integer 42 are distinct keys")
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
    val keys = idx.collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("id"))).toSet
    assert(keys == Set(("Hanks", n), ("Wilson", n)))
  }

  test("prefixRange matches startsWith semantics") {
    val idx = UniqueIndex.build(g.nodes, IndexInfo("LastName", Seq("Actor"), "lastName"))
    val viaRange = idx.filter(UniqueIndex.prefixRange(col("key"), "Fish")).count()
    assert(viaRange == 1)
  }
}

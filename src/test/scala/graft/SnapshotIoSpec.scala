package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{GraphBuilder, GraphSnapshot, Model}
import graft.model.PropertyValue._
import graft.operators.Mvcc

/** Storage lifecycle (SURVEY §2.1): write/checkpoint a snapshot,
  * reopen it, and get identical data back — including the model
  * dictionary and property update-in-place semantics
  * (APITest.hs:112-127: an update replaces the whole property map).
  */
class SnapshotIoSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft-snap").toString

  test("snapshot write + open round-trips nodes, edges and props") {
    val b = new GraphBuilder
    val a = b.addNode("Actor", Map("name" -> Seq(PVText("Tom Hanks")), "age" -> Seq(PVInteger(60))))
    val m = b.addNode("Movie", Map("name" -> Seq(PVText("Forrest Gump"))))
    b.addEdge(a, m, "Played", Map("role" -> Seq(PVText("Forrest Gump"))))
    val g   = b.snapshot(spark)
    val dir = tmp()
    g.write(dir)
    val g2 = GraphSnapshot.open(spark, dir)
    assert(g2.nbNodes == 2 && g2.nbEdges == 1)
    val props = g2.nodes.filter(col("id") === a)
      .select(explode(col("props"))).collect().map(_.getString(0)).toSet
    assert(props == Set("name", "age"))
    val role = g2.edges.select(element_at(col("props").getItem("role"), 1).getField("vText"))
      .collect().head.getString(0)
    assert(role == "Forrest Gump")
  }

  test("model dictionary derives, persists and reloads") {
    val b = new GraphBuilder
    val n1 = b.addNode("Actor", Map("name" -> Seq(PVText("x")), "age" -> Seq(PVInteger(1))))
    b.addNode("Movie", Map("name" -> Seq(PVText("y"))))
    b.addEdge(n1, n1, "Self")
    val g = b.snapshot(spark)
    val model = Model.fromSnapshot(spark, g)
    val dir = tmp()
    Model.write(model, dir)
    val back = Model.read(spark, dir)
    assert(Model.lookup(back, "node") == Map("Actor" -> 1, "Movie" -> 2))
    assert(Model.lookup(back, "edge") == Map("Self" -> 1))
    // property types are (name, dataType) pairs: name=TEXT and age=INT
    val props = back.filter(col("kind") === "prop")
      .select("name", "dataType").collect().map(r => (r.getString(0), r.getByte(1))).toSet
    assert(props == Set(("name", 0.toByte), ("age", 1.toByte)))
  }

  test("property update replaces the whole map (APITest.hs:112-127)") {
    val b = new GraphBuilder
    val a = b.addNode("Actor", Map("name" -> Seq(PVText("Tom")), "age" -> Seq(PVInteger(60))))
    val g = b.snapshot(spark)
    // update via MVCC copy-on-write: new version carries ONLY the new map
    val updated = Mvcc.update(g.nodes, col("id") === a, 5L,
      df => df.withColumn("props",
        graft.model.PropValues.propsMap("name" -> graft.model.PropValues.pvText(lit("Tom Hanks")))))
    val now = Mvcc.readAsOf(updated, 9L)
      .select(explode(col("props"))).collect().map(_.getString(0)).toSet
    assert(now == Set("name"), "age must be gone — whole-map replace")
    val before = Mvcc.readAsOf(updated, 4L)
      .select(explode(col("props"))).collect().map(_.getString(0)).toSet
    assert(before == Set("name", "age"), "old snapshot keeps the old map")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Mvcc

/** Conformance with LowLevelDB MVCCSpec.hs:15-165 scenarios over
  * version-columned DataFrames (FIXTURES.md §4).
  */
class MvccSpec extends GraftSuite {

  private val schema = StructType(Seq(
    StructField("key", LongType), StructField("value", LongType),
    StructField("tx_min", LongType), StructField("tx_max", LongType)))

  private def table(rows: (Long, Long, Long, Option[Long])*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, v, mn, mx) => Row(k, v, mn, mx.map(Long.box).orNull) }.toList.asJava,
      schema)
  }

  private def values(df: DataFrame): Set[(Long, Long)] =
    df.select("key", "value").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("own writes visible before commit; invisible to earlier snapshots") {
    // tx 5 wrote key 1; snapshots at tx 5 see it, tx 4 does not
    val t = table((1L, 10L, 5L, None))
    assert(values(Mvcc.readAsOf(t, 5)) == Set((1L, 10L)))
    assert(values(Mvcc.readAsOf(t, 4)) == Set.empty)
    // committed (serial history): visible to any later tx
    assert(values(Mvcc.readAsOf(t, 6)) == Set((1L, 10L)))
  }

  test("update closes the old version and appends a new one") {
    val t  = table((1L, 10L, 1L, None), (2L, 20L, 1L, None))
    val t2 = Mvcc.update(t, col("key") === 1L, 5L, _.withColumn("value", col("value") + 1))
    assert(values(Mvcc.readAsOf(t2, 4)) == Set((1L, 10L), (2L, 20L)), "old snapshot unchanged")
    assert(values(Mvcc.readAsOf(t2, 9)) == Set((1L, 11L), (2L, 20L)), "new snapshot sees update")
    assert(t2.count() == 3, "copy-on-write appended exactly one version")
  }

  test("delete hides the row from later snapshots only") {
    val t  = table((1L, 10L, 1L, None))
    val t2 = Mvcc.delete(t, col("key") === 1L, 5L)
    assert(values(Mvcc.readAsOf(t2, 4)) == Set((1L, 10L)))
    assert(values(Mvcc.readAsOf(t2, 9)) == Set.empty)
  }

  test("uncommitted / concurrent writes are invisible (explicit committed set)") {
    // tx 3 wrote but is NOT in the committed set of the reading tx 10
    val t = table((1L, 10L, 1L, None), (2L, 20L, 3L, None))
    val committedForTx10 = Set(1L)
    val vis = Mvcc.visible(10L, c => c.isin(committedForTx10.toSeq: _*))
    assert(values(t.filter(vis)) == Set((1L, 10L)), "tx 3's write invisible until committed")
    // deleter uncommitted -> row still visible
    val t3  = table((1L, 10L, 1L, Some(3L)))
    assert(values(t3.filter(vis)) == Set((1L, 10L)), "uncommitted delete ignored")
  }

  test("rollback = tx absent from every later committed set") {
    // tx 7 inserted a row and deleted another, then rolled back
    val t = table((1L, 10L, 7L, None), (2L, 20L, 1L, Some(7L)))
    val committed = Set(1L) // 7 never joins
    val vis = Mvcc.visible(10L, c => c.isin(committed.toSeq: _*))
    assert(values(t.filter(vis)) == Set((2L, 20L)), "insert discarded, delete undone")
  }

  test("Wikipedia MVCC worked example (MVCCSpec.hs:134-165)") {
    // t0 inserts a=1,b=1; t1 updates b->2; t2 deletes a; t3 reads at
    // each point of the serial history.
    var t = table()
    t = t.unionAll(table((1L, 1L, 0L, None), (2L, 1L, 0L, None))) // tx0 insert a,b
    assert(values(Mvcc.readAsOf(t, 1)) == Set((1L, 1L), (2L, 1L)))
    t = Mvcc.update(t, col("key") === 2L, 1L, _.withColumn("value", lit(2L))) // tx1: b=2
    assert(values(Mvcc.readAsOf(t, 1)) == Set((1L, 1L), (2L, 2L)), "tx1 sees own update")
    assert(values(Mvcc.readAsOf(t, 2)) == Set((1L, 1L), (2L, 2L)))
    t = Mvcc.delete(t, col("key") === 1L, 2L) // tx2: delete a
    assert(values(Mvcc.readAsOf(t, 3)) == Set((2L, 2L)), "final state: only b=2")
    // and time travel back to the beginning still works
    assert(values(Mvcc.readAsOf(t, 1)) == Set((1L, 1L), (2L, 2L)))
  }

  test("disjoint transactions compose in either order (RawSpec concurrency analog)") {
    val t = table((1L, 10L, 1L, None), (2L, 20L, 1L, None), (3L, 30L, 1L, None))
    def upd(df: DataFrame, key: Long, tx: Long) =
      Mvcc.update(df, col("key") === key, tx, _.withColumn("value", col("value") * 10))
    // tx 5 touches key 1, tx 6 touches key 2 — application order must
    // not matter for any later snapshot
    val ab = upd(upd(t, 1L, 5L), 2L, 6L)
    val ba = upd(upd(t, 2L, 6L), 1L, 5L)
    (7L to 9L).foreach { tx =>
      assert(values(Mvcc.readAsOf(ab, tx)) == values(Mvcc.readAsOf(ba, tx)))
    }
    assert(values(Mvcc.readAsOf(ab, 9)) == Set((1L, 100L), (2L, 200L), (3L, 30L)))
  }

  test("compaction drops dead versions without changing post-horizon reads") {
    var t = table((1L, 10L, 1L, None), (2L, 20L, 1L, None))
    t = Mvcc.update(t, col("key") === 1L, 3L, _.withColumn("value", lit(11L)))
    t = Mvcc.delete(t, col("key") === 2L, 4L)
    t = Mvcc.update(t, col("key") === 1L, 6L, _.withColumn("value", lit(12L)))
    val compacted = Mvcc.compact(t, horizon = 5L)
    assert(compacted.count() < t.count(), "dead versions removed")
    (5L to 8L).foreach { tx =>
      assert(values(Mvcc.readAsOf(compacted, tx)) == values(Mvcc.readAsOf(t, tx)),
        s"snapshot at tx=$tx unchanged by compaction")
    }
    // pre-horizon time travel is (by design) no longer served
    assert(values(Mvcc.readAsOf(compacted, 2)) != values(Mvcc.readAsOf(t, 2)))
  }

  test("cascading node delete closes incident edges (APITest.hs:55-68)") {
    import graft.core.GraphBuilder
    import graft.model.PropertyValue._
    val b  = new GraphBuilder
    val th = b.addNode("Actor", Map("name" -> Seq(PVText("Tom Hanks"))))
    val fg = b.addNode("Movie", Map("name" -> Seq(PVText("Forrest Gump"))))
    val ss = b.addNode("Movie", Map("name" -> Seq(PVText("Sleepless in Seattle"))))
    b.addEdge(th, fg, "Played"); b.addEdge(th, ss, "Played"); b.addEdge(fg, ss, "SameYear")
    val g = b.snapshot(spark)
    val (n2, e2) = Mvcc.deleteNodeCascade(g.nodes, g.edges, col("id") === th, 5L)
    assert(Mvcc.readAsOf(n2, 9).count() == 2, "actor gone")
    val liveEdges = Mvcc.readAsOf(e2, 9)
    assert(liveEdges.count() == 1, "both Played edges closed, SameYear survives")
    assert(liveEdges.collect().head.getAs[String]("label") == "SameYear")
    // pre-delete snapshot unaffected
    assert(Mvcc.readAsOf(e2, 4).count() == 3)
  }

  test("updateEdgeProps: COW on edges, nodes untouched (STMGraph API.hs:181-190)") {
    import graft.core.GraphBuilder
    import graft.model.{PropValues, PropertyValue}
    import graft.model.PropertyValue._
    val b  = new GraphBuilder
    val th = b.addNode("Actor", Map("name" -> Seq(PVText("Tom Hanks"))))
    val fg = b.addNode("Movie", Map("name" -> Seq(PVText("Forrest Gump"))))
    val ss = b.addNode("Movie", Map("name" -> Seq(PVText("Sleepless in Seattle"))))
    b.addEdge(th, fg, "Played", Map("role" -> Seq(PVText("lead"))))
    b.addEdge(th, ss, "Played", Map("role" -> Seq(PVText("cameo"))))
    val g = b.snapshot(spark)

    // promote the cameo to lead (whole-map replacement, the
    // reference's edgeProperties semantics)
    val cameo = PropValues.hasValue(col("props"), "role", PVText("cameo"))
    val g2 = g.updateEdgeProps(cameo, 5L,
      _ => PropValues.propsMap("role" -> PropValues.pvText(lit("lead"))))

    // live view: both edges now lead; version history intact
    val roles = g2.live.edges
      .select(explode(col("props").getItem("role")).as("v"))
      .select(col("v.vText")).collect().map(_.getString(0))
    assert(roles.toSeq.sorted == Seq("lead", "lead"))
    assert(g2.edges.count() == 3, "old version closed, copy appended")
    assert(Mvcc.readAsOf(g2.edges, 4L).count() == 2, "pre-update snapshot keeps the cameo")
    assert(
      Mvcc.readAsOf(g2.edges, 4L)
        .filter(PropValues.hasValue(col("props"), "role", PVText("cameo"))).count() == 1)
    // nodes are identity under edge mutation
    assert(g2.nodes.collect().toSeq == g.nodes.collect().toSeq)
    // endpoints and label carried unchanged onto the new version
    val fresh = g2.edges.filter(col("tx_min") === 5L).collect().head
    assert(fresh.getAs[Long]("src") == th && fresh.getAs[Long]("dst") == ss)
    assert(fresh.getAs[String]("label") == "Played")
  }
}

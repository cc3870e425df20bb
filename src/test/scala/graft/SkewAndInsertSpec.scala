package graft

import org.apache.spark.sql.functions._

import graft.operators.{Skew, UniqueIndex}
import graft.streaming.Sessionize

class SkewAndInsertSpec extends GraftSuite {
  import spark.implicits._

  test("salted per-group top-k equals the plain window") {
    val t = graft.sources.Tables(spark, sf001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("o_custkey", "o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = canon(Skew.perGroupTopK(t.orders, col("o_custkey"), col("o_orderkey"), 3))
    val salted = canon(Skew.saltedPerGroupTopK(t.orders, col("o_custkey"), col("o_orderkey"), 3, 8))
    assert(plain == salted && plain.nonEmpty)
  }

  test("insertNew: existing and in-batch duplicate keys are rejected, first wins") {
    val index = Seq(("a", 1L), ("b", 2L)).toDF("key", "id")
    val entries = Seq(("a", 10L), ("c", 3L), ("c", 4L), ("d", 5L)).toDF("key", "id")
    val (newIdx, rejected) = UniqueIndex.insertNew(index, entries, Seq("key"))
    val idx = newIdx.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 5L))
    val rej = rejected.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rej == Set(("a", 1L, 10L), ("c", 3L, 4L)))
  }

  test("insertNew composes with build-produced typed indexes") {
    import graft.core.GraphBuilder
    import graft.model.PropertyValue._
    import graft.operators.UniqueIndex.IndexInfo
    val b = new GraphBuilder
    b.addNode("T", Map("k" -> Seq(PVText("x"))))
    val idx = UniqueIndex.build(b.snapshot(spark).nodes, IndexInfo("K", Seq("T"), "k"))
    val entries = Seq((0.toByte, "x", 50L), (0.toByte, "y", 51L), (1.toByte, "x", 52L))
      .toDF("vType", "key", "id")
    val (newIdx, rejected) = UniqueIndex.insertNew(idx, entries) // default (vType, key)
    assert(newIdx.count() == 3, "y and typed int-x inserted; text-x rejected")
    val rej = rejected.collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("attempted_id"))).toSet
    assert(rej == Set(("x", 50L)), "text 'x' exists; integer key 'x' is a different typed key")
  }

  test("skew-safe two-phase sessionization is row-identical to the window form") {
    val events = graft.sources.Tables(spark, sf0001).events
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_idx", "n_events", "start_sec", "end_sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // bucket (1h) far smaller than typical session spacing with a 30-min
    // gap -> many sessions split across buckets, exercising the merge
    val skewSafe = canon(Sessionize.sessionsSkewSafe(events, 1800L, bucketSec = 3600L))
    val plain    = canon(Sessionize.sessionsSql(events, 1800L))
    assert(skewSafe == plain && plain.nonEmpty)
  }

  test("typed and streaming sessionization agree with the SQL window form") {
    val events = graft.sources.Tables(spark, sf0001).events
    def canon(rows: Array[(Long, Long, Long, Long, Long)]) = rows.toSet
    val sql = canon(Sessionize.sessionsSql(events, 1800L)
      .select("user_id", "session_idx", "n_events", "start_sec", "end_sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val typed = canon(Sessionize.sessionsTyped(spark, events, 1800L)
      .collect().map(s => (s.user_id, s.session_idx, s.n_events, s.start_sec, s.end_sec)))
    assert(typed == sql && sql.nonEmpty)

    val q = Sessionize.sessionsStreaming(spark, sf0001, 1800L)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200)).start()
    // two triggers: batch 1 ingests + sets timeouts, batch 2 flushes
    Thread.sleep(100)
    var waited = 0
    while (waited < 60000 && spark.table("sess").count() < sql.size) {
      Thread.sleep(1000); waited += 1000
    }
    q.stop()
    val streamed = canon(spark.table("sess")
      .select("user_id", "session_idx", "n_events", "start_sec", "end_sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(streamed == sql)
  }

  test("cross-batch late event within the gap widens the open session's start") {
    // batch 1: event at 1000 opens the session
    val (c1, open1) = Sessionize.foldBatch(1L, None, Seq(1000L), 1800L)
    assert(c1.isEmpty && open1.contains(Sessionize.OpenSession(1L, 1000L, 1000L, 1)))
    // batch 2: late event at 900 (before the open start, within gap)
    // merges and LOWERS start — matching what sessionsSql would report
    val (c2, open2) = Sessionize.foldBatch(1L, open1, Seq(900L), 1800L)
    assert(c2.isEmpty && open2.contains(Sessionize.OpenSession(1L, 900L, 1000L, 2)))
    // batch 3: an event past the gap closes the widened session
    val (c3, open3) = Sessionize.foldBatch(1L, open2, Seq(5000L), 1800L)
    assert(c3 == Seq(Sessionize.Session(1L, 1L, 2L, 900L, 1000L)))
    assert(open3.contains(Sessionize.OpenSession(2L, 5000L, 5000L, 1)))
  }
}

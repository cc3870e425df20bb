package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

/** As-of and range joins — fixture semantics plus brute-force
  * equivalence over the real events table.
  */
class TemporalJoinSpec extends GraftSuite {

  private def df(rows: Seq[(Long, Long)], ts: String) = {
    import spark.implicits._
    rows.toDF("user_id", ts)
  }

  test("asOf picks the latest right row at or before each left ts, null when none") {
    val purchases = df(Seq((1L, 100L), (1L, 50L), (1L, 5L), (2L, 30L)), "p_sec")
    val views     = df(Seq((1L, 10L), (1L, 50L), (1L, 90L), (3L, 1L)), "v_sec")
    val out = TemporalJoin.asOf(purchases, views, Seq("user_id"), "p_sec", "v_sec", Seq("v_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(
      (1L, 100L, 90L), // latest view before 100
      (1L, 50L, 50L),  // inclusive: view AT 50 matches
      (1L, 5L, -1L),   // nothing precedes
      (2L, 30L, -1L))) // user has no views
  }

  test("asOf: a later right row with a NULL value supersedes an earlier non-null one") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("user_id", "p_sec")
    val right = Seq((1L, 10L, Some(7L)), (1L, 20L, None))
      .toDF("user_id", "v_sec", "value")
    val out = TemporalJoin.asOf(left, right, Seq("user_id"), "p_sec", "v_sec",
      Seq("value")).select("matched_value").head()
    // the ts-20 row IS the latest preceding right row; its NULL value
    // must be reported, not the stale 7 from ts 10
    assert(out.isNullAt(0), s"expected NULL, got $out")
  }

  test("asOf rejects input columns that collide with its internals") {
    import spark.implicits._
    val left  = Seq((1L, 100L, 5L)).toDF("user_id", "p_sec", "matched_value")
    val right = Seq((1L, 10L, 7L)).toDF("user_id", "v_sec", "value")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asOf(left, right, Seq("user_id"), "p_sec", "v_sec", Seq("value"))
    }
    assert(e.getMessage.contains("matched_value"))
  }

  test("range join respects bounds and bin boundaries") {
    val l = df(Seq((1L, 100L)), "l_sec")
    val r = df(Seq((1L, 100L), (1L, 101L), (1L, 400L), (1L, 401L), (2L, 150L)), "r_sec")
    val out = TemporalJoin.range(l, r, Seq("user_id"), "l_sec", "r_sec", 1L, 300L, Seq("r_sec"))
      .select("r_sec").collect().map(_.getLong(0)).toSet
    assert(out == Set(101L, 400L), "strictly-after lower bound, inclusive upper")
  }

  test("range join equals the naive inequality join on real events") {
    val e = graft.sources.Tables(spark, sf0001).events
      .selectExpr("user_id", "event_type", "ts div 1000000000 AS sec")
    val v = e.filter(col("event_type") === "view").select(col("user_id"), col("sec").as("v_sec"))
    val p = e.filter(col("event_type") === "purchase").select(col("user_id"), col("sec").as("p_sec"))
    val binned = TemporalJoin.range(v, p, Seq("user_id"), "v_sec", "p_sec", 1L, 7200L, Seq("p_sec"))
      .select("user_id", "v_sec", "p_sec").collect().map(_.toSeq).toSet
    val naive = v.join(p, Seq("user_id"))
      .filter(col("p_sec").between(col("v_sec") + 1, col("v_sec") + 7200))
      .select("user_id", "v_sec", "p_sec").collect().map(_.toSeq).toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("asOf equals the brute-force max-preceding computation on real events") {
    val e = graft.sources.Tables(spark, sf0001).events
      .selectExpr("user_id", "event_type", "ts div 1000000000 AS sec")
    val p = e.filter(col("event_type") === "purchase").select(col("user_id"), col("sec").as("p_sec"))
    val v = e.filter(col("event_type") === "view").select(col("user_id"), col("sec").as("v_sec"))
    val fast = TemporalJoin.asOf(p, v, Seq("user_id"), "p_sec", "v_sec", Seq("v_sec"))
      .select("user_id", "p_sec", "matched_v_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val brute = p.join(v, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("p_sec"))
      .agg(max(when(col("v_sec") <= col("p_sec"), col("v_sec"))).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    // brute force collapses duplicate (user, ts) rows; every fast row
    // must match its brute answer
    assert(fast.keys.toSet == brute && brute.nonEmpty)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session assignment over the event stream — the custom-state
  * streaming operator (SURVEY §2.10 extension; the batch form is the
  * declarative window formulation, used by the correctness gate).
  *
  * A session = consecutive events of one user with gaps <= `gapSec`.
  */
object Sessionize {

  final case class Ev(user_id: Long, sec: Long)
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
      start_sec: Long, end_sec: Long)

  /** Declarative batch form: boundary flags via lag, session index as
    * a running sum — two window passes over (user, time) ordering,
    * one shuffle on user_id. This is the 100 TB path: no state, no
    * driver involvement, AQE-splittable.
    */
  def sessionsSql(events: DataFrame, gapSec: Long): DataFrame = {
    val sec = expr("ts div 1000000000").as("sec") // epoch nanos -> seconds
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    events.select(col("user_id"), col("event_id"), sec)
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("boundary")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"))
  }

  /** Skew-safe batch form: a hot user serializes [[sessionsSql]] (all
    * their events sort inside one window partition). Two phases:
    * (1) local sessions within (user, coarse time bucket) — a hot
    * user's events parallelize across buckets; (2) merge
    * bucket-boundary sessions per user with the SAME gap rule — a
    * window over sessions, not events, so the residual per-user
    * sequential work shrinks by the mean session size. Gap-chaining
    * is associative over time-ordered runs (bucket ranges are
    * disjoint), so the result is row-identical to [[sessionsSql]]
    * (spec + gate pinned).
    */
  def sessionsSkewSafe(events: DataFrame, gapSec: Long, bucketSec: Long = 86400L): DataFrame = {
    val byUserBucket = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("sec"), col("event_id"))
    val local = events
      .select(col("user_id"), col("event_id"), expr("ts div 1000000000").as("sec"))
      .withColumn("bucket", expr(s"sec div $bucketSec"))
      .withColumn("prev", lag(col("sec"), 1).over(byUserBucket))
      .withColumn("boundary",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("local_idx",
        sum(col("boundary")).over(byUserBucket.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("bucket"), col("local_idx"))
      .agg(count(lit(1)).as("n"), min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
    // phase 2: sessions split by a bucket edge are < gap apart — merge
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("start_sec"))
    local
      .withColumn("prev_end", lag(col("end_sec"), 1).over(byUser))
      .withColumn("merge_boundary",
        when(col("prev_end").isNull || col("start_sec") - col("prev_end") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("merge_boundary")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sum(col("n")).as("n_events"), min(col("start_sec")).as("start_sec"),
        max(col("end_sec")).as("end_sec"))
  }

  /** Typed per-group form (KeyValueGroupedDataset): same result via
    * an in-group sort — the shape a custom stateful operator takes.
    */
  def sessionsTyped(spark: SparkSession, events: DataFrame, gapSec: Long): Dataset[Session] = {
    import spark.implicits._
    events.selectExpr("user_id", "ts div 1000000000 AS sec").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        sessionsOf(uid, it.map(_.sec).toSeq.sorted, gapSec).iterator
      }
  }

  private def sessionsOf(uid: Long, sorted: Seq[Long], gapSec: Long): Seq[Session] = {
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var idx = 1L; var start = sorted.head; var prev = sorted.head; var n = 1L
    sorted.tail.foreach { s =>
      if (s - prev > gapSec) {
        out += Session(uid, idx, n, start, prev)
        idx += 1; start = s; n = 1L
      } else n += 1
      prev = s
    }
    out += Session(uid, idx, n, start, prev)
    out.toSeq
  }

  /** Streaming state per user: ONLY the currently-open session —
    * (index, start, end, count). Constant-size regardless of how long
    * the user stays active, unlike retaining raw event times (which
    * grows O(events) for a continuously active user and defeats the
    * bounded-state promise of the streaming surface).
    */
  final case class OpenSession(idx: Long, start: Long, end: Long, n: Long)

  /** Streaming form with explicit group state. Each batch folds its
    * (sorted) events into the open session: an event within the gap
    * extends it; a later event CLOSES it — closed sessions emit
    * immediately, so indexes stay continuous without any buffered
    * history. Processing-time quiescence flushes the final open
    * session and clears the state. Cross-batch late events (older
    * than the open session's end minus the gap) merge into the open
    * session rather than resurrecting a closed one — the same
    * bounded-disorder contract a watermark gives the windowed ops.
    */
  def sessionsStreaming(spark: SparkSession, dir: String, gapSec: Long): Dataset[Session] = {
    import spark.implicits._
    val src = EventStream.eventsStream(spark, dir)
      .selectExpr("user_id", "ts div 1000000000 AS sec").as[Ev]
    sessionsStream(src, gapSec)
  }

  /** One batch of a user's events folded into the open session: the
    * pure core of [[sessionsStream]], exposed so cross-batch
    * semantics (late events merging into — and widening — the open
    * session) are testable without streaming-trigger timing.
    */
  def foldBatch(uid: Long, openIn: Option[OpenSession], secs: Seq[Long],
      gapSec: Long): (Seq[Session], Option[OpenSession]) = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var open   = openIn
    secs.sorted.foreach { s =>
      open = open match {
        case Some(o) if s - o.end <= gapSec =>
          // a late event may precede the open session's start —
          // widen both ends so start/end match the batch form
          Some(o.copy(start = math.min(o.start, s),
            end = math.max(o.end, s), n = o.n + 1))
        case Some(o) =>
          closed += Session(uid, o.idx, o.n, o.start, o.end)
          Some(OpenSession(o.idx + 1, s, s, 1))
        case None =>
          Some(OpenSession(1L, s, s, 1))
      }
    }
    (closed.toSeq, open)
  }

  /** The stateful transform itself, over any streaming Dataset[Ev]
    * (file stream above; MemoryStream in the cross-batch specs).
    */
  def sessionsStream(src: Dataset[Ev], gapSec: Long): Dataset[Session] = {
    import src.sparkSession.implicits._
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val last = state.getOption
              .map(o => Session(uid, o.idx, o.n, o.start, o.end))
            state.remove()
            last.iterator
          } else {
            val (closed, open) =
              foldBatch(uid, state.getOption, it.map(_.sec).toSeq, gapSec)
            open.foreach(state.update)
            state.setTimeoutDuration(100) // flush shortly after quiescence
            closed.iterator
          }
      }
  }
}

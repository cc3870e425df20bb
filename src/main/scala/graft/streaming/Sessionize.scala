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

  /** Streaming state per user: sessions already emitted (index
    * offset) plus pending event times. The offset survives flushes so
    * session indexes never restart mid-stream.
    */
  final case class UserState(base: Long, pending: Seq[Long])

  /** Streaming form with explicit group state. Two-phase flush on
    * processing-time quiescence: the first timeout emits every CLOSED
    * session and retains the newest (still-open) one; a second
    * timeout with no new events emits it too and clears the state.
    * A user returning within the gap between the two timeouts keeps
    * extending the open session — indexes stay continuous via the
    * carried base offset.
    */
  def sessionsStreaming(spark: SparkSession, dir: String, gapSec: Long): Dataset[Session] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .selectExpr("user_id", "ts div 1000000000 AS sec").as[Ev]

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[UserState]) =>
          val st = state.getOption.getOrElse(UserState(0L, Nil))
          if (state.hasTimedOut) {
            val sessions = sessionsOf(uid, st.pending.sorted, gapSec)
              .map(s => s.copy(session_idx = s.session_idx + st.base))
            if (sessions.size <= 1) {
              state.remove() // final open session emits now
              sessions.iterator
            } else {
              // emit closed sessions, keep the open one pending
              val open = sessions.last
              state.update(UserState(open.session_idx - 1,
                st.pending.sorted.takeRight(open.n_events.toInt)))
              state.setTimeoutDuration(100)
              sessions.init.iterator
            }
          } else {
            state.update(st.copy(pending = st.pending ++ it.map(_.sec)))
            state.setTimeoutDuration(100) // flush shortly after quiescence
            Iterator.empty
          }
      }
  }
}

package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Stage-level evidence for the `q_graph_hits` watch line (ROUND16.md
  * §hits): per-stage wall, executor run time, GC time, and task count
  * for every stage of [[graft.analytics.GraphAnalytics.hits]],
  * attributed to its half-round via the job descriptions `hits()`
  * sets (`hits:r<N>:auth` / `hits:r<N>:hub`).
  *
  * The r15 verdict's instruction: the one plan rewrite already
  * measured SLOWER, so instrument instead of guessing — run the exact
  * `q_graph_hits` workload `reps` times under a listener, print every
  * rep's per-stage table, and diff a fast run against a slow one to
  * name the stage that absorbs the delta (or show the profile is flat
  * and the variance lives outside the stages, i.e. in the box).
  *
  * Usage: `runMain graft.ProbeHits <sfDir> [reps]`. Every rep prints
  * one JSON line per stage plus a `rep_total`; nothing is aggregated
  * away (criterion-report rule).
  */
object ProbeHits {

  private final case class StageRow(rep: Int, phase: String, stageId: Int,
    name: String, wallMs: Long, runMs: Long, gcMs: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = graft.core.Graft.session("graft-probe-hits",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // stage -> phase attribution comes from the job description each
    // job carries; a stage belongs to the job that submitted it
    val stagePhase = mutable.Map.empty[Int, String]
    val rows = mutable.ArrayBuffer.empty[StageRow]
    var rep = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("outside")
        js.stageIds.foreach { sid =>
          stagePhase.synchronized { stagePhase(sid) = desc }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        val (runMs, gcMs) = Option(si.taskMetrics)
          .map(m => (m.executorRunTime, m.jvmGCTime)).getOrElse((0L, 0L))
        rows.synchronized {
          rows += StageRow(rep,
            stagePhase.synchronized(stagePhase.getOrElse(si.stageId, "?")),
            si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            runMs, gcMs, si.numTasks)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val t = graft.sources.Tables(spark, dir)
    def run(): Long = {
      val edges = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription("hits:final")
      val n = graft.analytics.GraphAnalytics.hits(edges, rounds = 2).count()
      spark.sparkContext.setJobDescription(null)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"""{"probe":"hits","rep":$rep,"event":"rep_total","rows":$n,"wall_ms":$ms}""")
      ms
    }

    val walls = (1 to reps).map { r =>
      rep = r
      val w = run()
      // drain this rep's stage rows in stage order, with a per-phase
      // rollup at the end of the rep (listener delivery is async and
      // the bus drain API is private — a bounded sleep is enough for
      // an evidence tool)
      Thread.sleep(1000)
      val mine = rows.synchronized { val m = rows.filter(_.rep == r).toList; m }
      mine.sortBy(_.stageId).foreach { s =>
        println(s"""{"probe":"hits","rep":$r,"phase":"${s.phase}","stage":${s.stageId},""" +
          s""""name":"${s.name}","wall_ms":${s.wallMs},"run_ms":${s.runMs},""" +
          s""""gc_ms":${s.gcMs},"tasks":${s.tasks}}""")
      }
      mine.groupBy(_.phase).toSeq.sortBy(_._2.map(_.stageId).min).foreach {
        case (ph, ss) =>
          println(s"""{"probe":"hits","rep":$r,"event":"phase_total","phase":"$ph",""" +
            s""""stages":${ss.size},"wall_ms":${ss.map(_.wallMs).sum},""" +
            s""""run_ms":${ss.map(_.runMs).sum},"gc_ms":${ss.map(_.gcMs).sum}}""")
      }
      w
    }
    val sorted = walls.sorted
    println(s"""{"probe":"hits","event":"summary","reps":$reps,""" +
      s""""min_ms":${sorted.head},"median_ms":${sorted(reps / 2)},""" +
      s""""max_ms":${sorted.last}}""")
    spark.stop()
  }
}

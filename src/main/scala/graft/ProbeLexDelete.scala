package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** Lexical-takedown cost probe (SCALE.md evidence, not a driver
  * contract): the r15 claim is that `deleteDocs` resolves victim dl
  * from the id-bucketed doclens sidecar in O(batch) where it used to
  * scan the whole token-bucketed postings index. The OLD path still
  * exists verbatim as the sidecar-missing fallback, so the experiment
  * is exact: publish the 100x corpus once, time `victimDls` for a
  * takedown batch (a) against the sidecar (pruned read) and (b) with
  * the sidecar dir removed (the pre-r15 postings scan), interleaved,
  * `reps` times each, every rep printed.
  *
  * Usage: `runMain graft.ProbeLexDelete <dir> [reps] [victims]`.
  */
object ProbeLexDelete {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val nVictims = if (args.length > 2) args(2).toInt else 1000
    val spark = graft.core.Graft.session("graft-probe-lexdelete",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val path = java.nio.file.Files.createTempDirectory("graft-lexdel").toString + "/idx"
    val t0 = System.nanoTime()
    Retrieval.publishIndex(docs, "doc_id", col("text"), path, buckets = 64)
    println(f"""{"probe":"lexdelete","event":"publish","docs":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")

    // victims spread across id buckets (every 97th id)
    val victims: Seq[Long] = (0 until nVictims).map(_.toLong * 97L % n)

    def time(tag: String): Unit = (1 to reps).foreach { _ =>
      val s = System.nanoTime()
      val dls = Retrieval.victimDls(spark, path, victims.distinct)
      val w = (System.nanoTime() - s) / 1e9
      println(f"""{"probe":"lexdelete","path":"$tag%s","victims":${victims.distinct.size},"resolved":${dls.size},"sec":$w%.2f}""")
    }

    time("doclens")
    // simulate the pre-r15 layout: remove the sidecar, forcing the
    // full-postings fallback (identical code to the old deleteDocs)
    val saved = java.nio.file.Files.createTempDirectory("graft-lexdel-save").toString
    graft.core.Sidecar.renameDir(s"$path/doclens", s"$saved/doclens")
    time("postings_scan")
    graft.core.Sidecar.renameDir(s"$saved/doclens", s"$path/doclens")
    time("doclens_again") // interleave guard: warmth did not decide it
    spark.stop()
  }
}

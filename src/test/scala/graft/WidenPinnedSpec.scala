package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics
import graft.pipeline.TextOps

/** The r16 explosive-stage widening helpers: a narrow MATERIALIZED
  * frame is pinned to machine width by key (REPARTITION_BY_NUM — the
  * one shuffle origin AQE never coalesces), a machine-wide frame is
  * returned untouched, and results are partition-invariant.
  */
class WidenPinnedSpec extends GraftSuite {
  import spark.implicits._

  private val p = spark.sparkContext.defaultParallelism

  test("widenPinned pins a narrow checkpoint to defaultParallelism") {
    val cp = (1L to 100L).toDF("k").repartition(2).localCheckpoint(true)
    assert(cp.rdd.getNumPartitions == 2)
    val w = GraphAnalytics.widenPinned(cp, col("k"))
    assert(w.rdd.getNumPartitions == p)
    // row set unchanged
    assert(w.as[Long].collect().sorted.toSeq == (1L to 100L))
  }

  test("widenPinned is a no-op on a machine-wide checkpoint") {
    val cp = (1L to 100L).toDF("k").repartition(p + 4).localCheckpoint(true)
    val w = GraphAnalytics.widenPinned(cp, col("k"))
    assert(w eq cp) // literally the same frame: no extra exchange
  }

  test("maybeRepartition keys off the GAUGE frame's width") {
    val narrowGauge = (1L to 10L).toDF("g").repartition(1).localCheckpoint(true)
    val wideGauge = (1L to 10L).toDF("g").repartition(p + 1).localCheckpoint(true)
    val df = (1L to 50L).toDF("k")
    assert(GraphAnalytics.maybeRepartition(df, narrowGauge, col("k"))
      .rdd.getNumPartitions == p)
    assert(GraphAnalytics.maybeRepartition(df, wideGauge, col("k")) eq df)
  }

  test("spread leaves exchange-rooted frames alone (no eager upstream execution)") {
    // a groupBy plants an Exchange in the physical plan; spread must
    // return the frame unchanged instead of asking .rdd for its width
    // (which under AQE would EXECUTE the upstream shuffle and discard it)
    // the input must be multi-partition or EnsureRequirements plans no
    // Exchange at all (SinglePartition satisfies every distribution)
    val agg = (1L to 100L).toDF("k").repartition(4)
      .groupBy(col("k") % 10).count()
    assert(TextOps.spread(agg, col("count")) eq agg)
  }

  test("triangleCount/clusteringCoefficients results are width-invariant") {
    // two triangles sharing an edge: {1,2,3}, {2,3,4} — counted on a
    // deliberately narrow input (1 partition) so the pinned-widening
    // path is exercised end to end
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst").repartition(1)
    assert(GraphAnalytics.triangleCount(e).as[Long].head() == 2L)
    val lcc = GraphAnalytics.clusteringCoefficients(e)
      .select("id", "n_tri").as[(Long, Long)].collect().toMap
    assert(lcc == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}

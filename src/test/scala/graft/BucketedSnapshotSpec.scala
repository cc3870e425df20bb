package graft

import org.apache.spark.sql.functions._

import graft.core.{GraphSnapshot, TpchGraph}
import graft.operators.QueryStep
import graft.operators.QueryStep.{RelationStep, OUT}

/** The bucketed snapshot layout (GraphSnapshot.writeBucketed) must
  * make the queryStep expansion join shuffle-free: nodes bucketed by
  * id and edges bucketed by src co-locate the join keys at write
  * time, so the plan has no Exchange on either side of
  * edges.src = nodes.id.
  */
class BucketedSnapshotSpec extends GraftSuite {

  private def dropLeftovers(names: String*): Unit = {
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    names.foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val d = new java.io.File(wh, tb)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
  }

  test("published bucketed snapshot: expansion join has no Exchange and agrees with the plain plan") {
    dropLeftovers("gsnap_nodes", "gsnap_edges", "gsnap_edges_dst")
    val g = TpchGraph.snapshot(spark, sf0001)
    g.writeBucketed("gsnap", buckets = 8, mirrorByDst = true)
    val bucketed = GraphSnapshot.openBucketed(spark, "gsnap")

    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at 100 TB neither side broadcasts — force the large-table path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // the raw expansion join (the queryStep hop): zero Exchange
      val hop = bucketed.live.edges.filter(col("label") === "placed")
        .join(bucketed.live.nodes.select(col("id").as("nid")), col("src") === col("nid"))
      val hopPlan = hop.queryExecution.executedPlan.toString
      assert(hopPlan.contains("SortMergeJoin"), hopPlan)
      assert(hopPlan.contains("Bucketed: true"), s"scan must use buckets:\n$hopPlan")
      assert(!hopPlan.contains("Exchange"), s"bucketed expansion join must not shuffle:\n$hopPlan")

      // the full operator over the bucketed snapshot returns the same
      // rows as over the in-memory snapshot, and only the TARGET node
      // join may shuffle (2 Exchanges, vs 4 unbucketed)
      val step     = RelationStep(relTypes = Seq("placed"), direction = OUT)
      val sources  = bucketed.nodes.filter(col("label") === "customer").select(col("id"))
      val stepped  = QueryStep(bucketed, sources, step)
      val exchanges = "Exchange".r.findAllIn(stepped.queryExecution.executedPlan.toString).size
      assert(exchanges <= 2, s"expected only the target-node join to shuffle, got $exchanges Exchanges")

      val plainSrc = g.nodes.filter(col("label") === "customer").select(col("id"))
      val expected = QueryStep(g, plainSrc, step)
        .select("src_id", "rel_id", "tgt_id").collect().map(_.toSeq).toSet
      val actual = stepped.select("src_id", "rel_id", "tgt_id").collect().map(_.toSeq).toSet
      assert(actual == expected, "bucketed and plain snapshots answer identically")

      // IN direction over the dst-bucketed mirror: also shuffle-free
      val mirror = GraphSnapshot.openBucketedDstMirror(spark, "gsnap")
      val inHop = mirror.live.edges.filter(col("label") === "placed")
        .join(mirror.live.nodes.select(col("id").as("nid")), col("dst") === col("nid"))
      val inPlan = inHop.queryExecution.executedPlan.toString
      assert(inPlan.contains("SortMergeJoin") && !inPlan.contains("Exchange"),
        s"dst-mirror IN join must not shuffle:\n$inPlan")
      assert(inHop.count() == hop.count(), "mirror holds the same edges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      dropLeftovers("gsnap_nodes", "gsnap_edges", "gsnap_edges_dst")
    }
  }

  test("bucketed gate queries: zero-Exchange expansion, results equal the plain variants") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at 100 TB neither side broadcasts — force the large-table path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      def rows(name: String) = graft.queries.Catalog.byName(name)
        .build(spark, sf0001).collect().map(_.toSeq).toSet
      def exchanges(name: String): Int = {
        val plan = graft.queries.Catalog.byName(name)
          .build(spark, sf0001).queryExecution.executedPlan.toString
        "Exchange".r.findAllIn(plan).size
      }

      // OUT + per-source window limit: join AND window both consume
      // the bucket partitioning — the whole plan has no Exchange
      assert(exchanges("q_step_out_limit_bucketed") == 0,
        "bucketed OUT expansion + window must be shuffle-free")
      assert(rows("q_step_out_limit_bucketed") == rows("q_step_out_limit"))

      // BOTH over src-buckets + dst mirror: both expansion halves are
      // shuffle-free SMJs, and the per-group count consumes the same
      // hash partitioning THROUGH the union (both children cluster on
      // src_id with the same bucket count), so the whole plan — two
      // joins plus the aggregate — has no Exchange at all
      assert(exchanges("q_step_both_bucketed") == 0,
        "mirrored BOTH expansion + aggregate must be shuffle-free")
      assert(rows("q_step_both_bucketed") == rows("q_step_both"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Proof of the SCALE.md bucketing claim: edges bucketed by src and
  * nodes bucketed by id (same bucket count) join with NO shuffle on
  * either side — the queryStep hop becomes exchange-free.
  */
class BucketingSpec extends GraftSuite {

  test("bucketed nodes ⋈ edges join plans without an Exchange") {
    val t = graft.sources.Tables(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS b_edges")
    spark.sql("DROP TABLE IF EXISTS b_nodes")
    // a previously-failed run can leave the location behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_edges", "b_nodes").foreach { tb =>
      val d = new java.io.File(wh, tb)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    t.orders.select(col("o_custkey").as("src"), col("o_orderkey").as("edge_id"))
      .write.bucketBy(8, "src").sortBy("src").mode("overwrite").saveAsTable("b_edges")
    t.customer.select(col("c_custkey").as("id"), col("c_name"))
      .write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("b_nodes")

    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the large-table path: at 100 TB neither side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_nodes")
        .join(spark.table("b_edges"), col("id") === col("src"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == t.orders.count(), "join is still correct")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bucket count is sized by bytes per bucket, power-of-two, clamped") {
    import graft.core.GraphSnapshot.bucketsForBytes
    val target = 256L << 20
    // small publishes clamp to the 16-bucket parallelism floor
    assert(bucketsForBytes(BigInt(1) << 20, target) == 16)
    assert(bucketsForBytes(BigInt(0), target) == 16)
    // 14 GB / 256 MB = 56 -> next pow2 = 64 (the measured 100x optimum)
    assert(bucketsForBytes(BigInt(14) << 30, target) == 64)
    // 100 TB lands at the 4096 ceiling: ~25 GB/bucket would exceed a
    // task's memory, but the ceiling bounds file-listing cost; a real
    // deployment raises the ceiling with the cluster size
    assert(bucketsForBytes(BigInt(100) << 40, target) == 4096)
    // monotone around a pow2 boundary
    assert(bucketsForBytes(BigInt(16) * target, target) == 16)
    assert(bucketsForBytes(BigInt(16) * target + 1, target) == 32)
    // test-SF snapshots hit the floor through the instance method
    val snap = graft.core.TpchGraph.snapshot(spark, sf0001)
    assert(snap.autoBuckets() == 16)
  }

  test("autoBuckets is not fooled by join-inflated size estimates") {
    val snap = graft.core.TpchGraph.snapshot(spark, sf0001)
    // an edges lineage containing a join: the top-level size stat is
    // the product-of-children heuristic (~GBs for KB inputs) and
    // would saturate the bucket count without the leaf-sum guard
    val joinedEdges = snap.edges.as("e")
      .join(snap.nodes.select(col("id")).as("n"), col("e.src") === col("n.id"))
      .select(snap.edges.columns.toIndexedSeq.map(c => col(s"e.$c")): _*)
    val g = graft.core.GraphSnapshot(snap.nodes, joinedEdges)
    val top = joinedEdges.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(top > (BigInt(1) << 30), s"precondition: join estimate should be inflated, got $top")
    assert(g.autoBuckets() == 16, "guard must fall back to leaf-scan bytes")
  }
}

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
}

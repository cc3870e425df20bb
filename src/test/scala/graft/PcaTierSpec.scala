package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Pca}

/** The partitioned PCA tier: probe reads only the probed cell
  * directories, the rerank's raw-corpus scan is id-pruned, and
  * probe-all + full candidates degenerates to brute force.
  */
class PcaTierSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val model = Pca.train(spark, emb, "vec_id", "embedding", dOut = 8)
  private lazy val (coarse, path) = {
    val p = graft.queries.SessionPublish.tempDir("pca-tier") + "/layout"
    val c = Pca.writePartitionedPca(spark, emb, "vec_id", "embedding", model,
      nlist = 8, p)
    (c, p)
  }

  private def q: Array[Float] =
    emb.filter(col("vec_id") === 0L).head().getSeq[Float](1).toArray

  test("the probe scan reads only the probed cell directories") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      Ivf.topKPartitioned(spark, path, "vec_id", "embedding", coarse,
          Pca.driverProject(model, q), 30, nprobe = 2,
          pred = col("vec_id") =!= 0L)
        .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert(scans.nonEmpty)
    assert(scans.forall(_.selectedPartitions.partitionCount <= 2),
      "probe must prune to the nprobe cells")
  }

  test("the rerank corpus scan carries a pushed In filter on the ids") {
    val plan = Pca.topKRerankPartitionedPca(spark, path, emb, "vec_id",
        "embedding", model, coarse, q, k = 10, candidates = 30, nprobe = 2,
        pred = col("vec_id") =!= 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(vec_id"),
      s"rerank must push the candidate ids into the corpus scan")
  }

  test("probe-all + full candidates degenerates to brute force") {
    val got = Pca.topKRerankPartitionedPca(spark, path, emb, "vec_id",
        "embedding", model, coarse, q, k = 10, candidates = emb.count().toInt,
        nprobe = coarse.nlist, pred = col("vec_id") =!= 0L)
      .as[(Long, Double)].collect().toSeq
    val exact = graft.pipeline.Similarity.topK(
        emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q.toSeq, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got === exact)
  }
}

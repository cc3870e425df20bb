package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Two-phase global rank (Skew.globalRank): exact equality with the
  * naive single-partition window, a plan free of SinglePartition
  * exchanges, and stability across invocations.
  */
class ShuffleRankSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
    .select(col("doc_id"), md5(col("text")).as("h"))

  private def ranked: Map[Long, Long] =
    Skew.globalRank(docs, Seq(col("h"), col("doc_id")), "rnk")
      .select(col("doc_id"), col("rnk"))
      .as[(Long, Long)].collect().toMap

  test("matches the naive global window exactly") {
    val naive = docs
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rnk"))
      .as[(Long, Long)].collect().toMap
    assert(ranked === naive)
  }

  test("ranks are a contiguous permutation and stable across runs") {
    val r1 = ranked
    assert(r1.values.toSeq.sorted === (1L to r1.size.toLong))
    assert(ranked === r1)
  }

  test("the plan has no SinglePartition exchange") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      Skew.globalRank(docs, Seq(col("h"), col("doc_id")), "rnk")
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert(!plan.contains("SinglePartition"),
      s"two-phase rank must not gather to one partition")
  }

  test("skewed many-duplicate keys still rank exactly (strict-order tiebreaker)") {
    val skewed = (1L to 5000L).map(i => (i, if (i % 10 == 0) "hot" else s"k$i"))
      .toDF("id", "k")
    val got = Skew.globalRank(skewed, Seq(col("k"), col("id")), "rnk")
      .select(col("id"), col("rnk")).as[(Long, Long)].collect().toMap
    val naive = skewed.withColumn("rnk", row_number()
        .over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select(col("id"), col("rnk")).as[(Long, Long)].collect().toMap
    assert(got === naive)
  }
}

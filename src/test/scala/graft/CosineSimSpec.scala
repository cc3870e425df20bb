package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSim
import graft.pipeline.Similarity

class CosineSimSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = {
    CosineSim.register(spark)
    graft.sources.Tables(spark, sf001).embeddings
  }

  test("native expression is bit-identical to the composable HOF form") {
    val q = emb.filter($"vec_id" === 7L).select("embedding").head().getSeq[Float](0)
    val both = emb.select(
      Similarity.cosine(col("embedding"), typedLit(q)).as("hof"),
      CosineSim.col(col("embedding"), typedLit(q)).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    assert(both.filter(col("hof").isNull =!= col("native").isNull).count() == 0)
  }

  test("expression participates in whole-stage codegen") {
    val p = emb.select(CosineSim.col(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*("), s"expected codegen stage in:\n$p")
    assert(p.contains("cosine_sim"), p)
  }

  test("SQL surface via extensions-style registration") {
    emb.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_id, cosine_sim(embedding, embedding) AS c FROM emb_v LIMIT 5").collect()
    assert(r.forall(x => math.abs(x.getDouble(1) - 1.0) < 1e-9), "self-cosine = 1")
  }

  test("null and mismatched-length inputs behave") {
    val df = Seq(
      (Some(Seq(1f, 0f)), Some(Seq(1f, 0f, 5f))),
      (None: Option[Seq[Float]], Some(Seq(1f, 0f)))
    ).toDF("a", "b")
    val r = df.select(CosineSim.col(col("a"), col("b")).as("c")).collect()
    // mismatched lengths: min-length prefix on both sides -> here 1.0
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12, "prefix-length semantics")
    assert(r(1).isNullAt(0), "null propagates")
  }
}

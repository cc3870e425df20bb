package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Sketch, TextOps}

class SketchSpec extends GraftSuite {

  private lazy val toks = graft.sources.Tables(spark, sf0001).documents
    .select(explode(TextOps.tokens(col("text"))).as("token"))

  test("count-min estimates upper-bound the true counts, tightly for frequent items") {
    val sk  = Sketch.countMin(toks, col("token"))
    val tf  = toks.groupBy(col("token")).agg(count(lit(1)).as("true_n"))
    val est = Sketch.estimate(sk, tf.select(col("token")), col("token"))
    val joined = tf.join(est, col("token") === col("item"))
      .select(col("true_n"), col("est")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(1) >= r.getLong(0)),
      "CMS never underestimates")
    val exact = joined.count(r => r.getLong(1) == r.getLong(0))
    assert(exact.toDouble / joined.length > 0.5,
      s"most estimates exact at this corpus/width ratio, got $exact/${joined.length}")
  }

  test("sketch size is depth x width bounded and merges additively") {
    val half1 = toks.limit(1000)
    val sk1 = Sketch.countMin(half1, col("token"), depth = 2, width = 64)
    assert(sk1.count() <= 2 * 64, "bounded regardless of corpus size")
    // merging = same groupBy over the union: sum of per-part counts
    val sk2    = Sketch.countMin(toks, col("token"), depth = 2, width = 64)
    val merged = sk2.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rebuilt = Sketch.countMin(toks.unionAll(toks), col("token"), depth = 2, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rebuilt == merged.map { case (k, v) => k -> v * 2 },
      "sketch of doubled corpus = elementwise doubled sketch")
  }

  test("absent item with empty buckets estimates zero") {
    val sk = Sketch.countMin(toks, col("token"), depth = 4, width = 1 << 20)
    import spark.implicits._
    val est = Sketch.estimate(sk, Seq("zzz_not_a_token_zzz").toDF("q"), col("q"),
      depth = 4, width = 1 << 20)
    assert(est.collect().head.getLong(1) == 0L, "wide sketch -> empty buckets -> 0")
  }
}

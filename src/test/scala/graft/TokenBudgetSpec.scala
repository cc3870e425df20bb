package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.pipeline.TextOps

/** Two-phase per-group prefix sums (Skew.perGroupPrefixSum) and the
  * hard-cap token-budget selection built on them.
  */
class TokenBudgetSpec extends GraftSuite {
  import spark.implicits._

  test("perGroupPrefixSum equals the naive per-group window") {
    val rows = (1 to 200).map(i => (i.toLong, s"g${i % 5}", (i * 7 % 13 + 1).toLong))
    val df = rows.toDF("id", "grp", "v").repartition(11)
    val got = Skew.perGroupPrefixSum(df, col("grp"), Seq(col("id")), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === want)
  }

  test("groups split across range partitions still sum exactly") {
    // One dominant group forces it across several range partitions.
    val rows = (1 to 500).map(i => (i.toLong, if (i % 50 == 0) "rare" else "big", 1L))
    val df = rows.toDF("id", "grp", "v").repartition(8)
    val got = Skew.perGroupPrefixSum(df, col("grp"), Seq(col("id")), col("v"))
    val bigMax = got.filter(col("grp") === "big").agg(max("cum")).head().getLong(0)
    val rareMax = got.filter(col("grp") === "rare").agg(max("cum")).head().getLong(0)
    assert(bigMax === 490L && rareMax === 10L)
  }

  private def corpus = Seq(
    (1L, "s0", "a b c d"),
    (2L, "s0", "e f g"),
    (3L, "s0", "h i j k l"),
    (4L, "s0", "m n"),
    (5L, "s1", "o p q r s t u v"),
    (6L, "s1", "w x"),
    (7L, "s2", "y z")).toDF("doc_id", "source", "text")

  test("budgets are never exceeded and the take is hash-maximal") {
    val budgets = Seq("s0" -> 8L, "s1" -> 9L, "s2" -> 0L)
    val kept = TextOps.takeToTokenBudget(corpus, "source", "doc_id", col("text"), budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = kept.groupBy(_._2)
    // never exceeded
    for ((s, b) <- budgets)
      assert(bySrc.get(s).map(_.map(_._3).sum).getOrElse(0L) <= b, s"budget $s")
    // zero budget keeps nothing
    assert(!bySrc.contains("s2"))
    // hash-maximal: replay the greedy take on the driver
    val raw = corpus.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long"),
        TextOps.hash32(0, col("doc_id").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = budgets.flatMap { case (s, b) =>
      var cum = 0L
      raw.filter(_._2 == s).sortBy(r => (r._4, r._1)).flatMap { r =>
        if (cum + r._3 <= b) { val e = (r._1, s, r._3, cum); cum += r._3; Some(e) }
        else { cum += r._3; None } // skip-and-continue is NOT the semantics:
        // the prefix stops contributing once cum passes b for a doc, but
        // later smaller docs with cum_before already past b stay excluded
        // because cum keeps growing monotonically.
      }
    }.toSet
    assert(kept.toSet === expected)
  }

  test("deterministic across repartitioning") {
    val budgets = Seq("s0" -> 8L, "s1" -> 9L)
    val a = TextOps.takeToTokenBudget(corpus.repartition(13), "source", "doc_id",
      col("text"), budgets).collect().toSet
    val b = TextOps.takeToTokenBudget(corpus.coalesce(1), "source", "doc_id",
      col("text"), budgets).collect().toSet
    assert(a === b)
  }

  // ---- α-sampling mixture ----

  private def skewedCorpus = {
    val big   = (1L to 100L).map(i => (i, "big", s"doc $i"))
    val small = (200L to 203L).map(i => (i, "small", s"doc $i"))
    (big ++ small).toDF("doc_id", "source", "text")
  }

  test("alphaMixture quotas are sqrt-proportional and never exceed the source") {
    val out = TextOps.alphaMixture(skewedCorpus, "source", "doc_id", keepPermille = 500)
    val quotas = out.groupBy(col("source"))
      .agg(max(col("quota")).as("q"), sum(col("selected")).as("sel"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // N=104, K=(500·104+999)/1000=52; weights: sqrt(100)=10, sqrt(4)=2, S=12
    // big: (52·10)/12 = 43; small: (52·2)/12 = 8 capped at n=4
    assert(quotas("big") === ((43L, 43L, 100L)))
    assert(quotas("small") === ((4L, 4L, 4L)))
    // flattening: the small source keeps 100%, the big one 43%
  }

  test("alphaMixture fills quotas in hash order of ids") {
    val out = TextOps.alphaMixture(skewedCorpus, "source", "doc_id", keepPermille = 200)
      .filter(col("source") === "big")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    val byHash = out.map(_._1).sortBy(id =>
      (graft.TokenBudgetSpecHash.h(id), id))
    val selected = out.filter(_._3 == 1L).map(_._1).toSet
    // K=(200·104+999)/1000=21; big quota (21·10)/12=17
    assert(selected.size == 17)
    assert(byHash.take(17).toSet === selected)
  }

  test("alphaMixture keepPermille=1000 keeps every doc of every source") {
    val out = TextOps.alphaMixture(skewedCorpus, "source", "doc_id", keepPermille = 1000)
    // K=N=104: big quota (104·10)/12=86 < 100 — even "keep all" honors
    // the sqrt flattening on the BIG source (quota is a mixture, not a
    // cap-free take); the small source keeps all 4
    val sel = out.groupBy(col("source")).agg(sum(col("selected")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel("small") == 4L && sel("big") == 86L)
  }
}

/** Driver-side mirror of TextOps.hash32(0, id) for test replay. */
object TokenBudgetSpecHash {
  def h(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"0|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.analytics.{GraphAnalytics, GraphEmbed}

/** Deterministic PPMI-spectral embeddings (analytics/GraphEmbed):
  * training determinism, exact integer surface, and the semantic
  * payoff — community structure separates in embedding space.
  */
class GraphEmbedSpec extends GraftSuite {
  import spark.implicits._

  // two 5-cliques bridged by one edge: the classic community fixture
  private val cliqueA = 1L to 5L
  private val cliqueB = 11L to 15L
  private lazy val edges = {
    val a = for (i <- cliqueA; j <- cliqueA if i < j) yield (i, j)
    val b = for (i <- cliqueB; j <- cliqueB if i < j) yield (i, j)
    (a ++ b :+ ((5L, 11L))).toDF("src", "dst")
  }

  private def pipeline(dim: Int) = {
    val pairs = GraphAnalytics.skipGramPairs(
      GraphAnalytics.deterministicWalks(edges, walkLen = 4), window = 2)
    val ppmi = GraphEmbed.ppmiMicro(pairs).localCheckpoint()
    val model = GraphEmbed.train(ppmi, dim)
    (ppmi, model)
  }

  private def vectors(dim: Int): Map[Long, Array[Long]] = {
    val (ppmi, model) = pipeline(dim)
    GraphEmbed.embeddings(ppmi, model)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (id, rows) =>
        val v = new Array[Long](dim)
        rows.foreach { case (_, d, e) => v(d.toInt - 1) = e }
        id -> v
      }
  }

  test("training is deterministic run-to-run") {
    val (ppmi, m1) = pipeline(3)
    val m2 = GraphEmbed.train(ppmi, 3)
    assert(m1.contexts.toSeq === m2.contexts.toSeq)
    assert(m1.vMicro.map(_.toSeq).toSeq === m2.vMicro.map(_.toSeq).toSeq)
  }

  test("communities cluster: every node's nearest neighbor is its own clique") {
    val vs = vectors(3)
    assert(vs.keySet === (cliqueA ++ cliqueB).toSet, "every node embeds")
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    def clique(id: Long) = if (id <= 5L) "A" else "B"
    for ((id, v) <- vs) {
      val (nn, _) = (vs - id).map { case (o, w) => (o, cos(v, w)) }.maxBy(_._2)
      assert(clique(nn) === clique(id),
        s"node $id nearest neighbor $nn crossed the community boundary")
    }
  }

  test("embedding rows equal lambda-weighted eigenvectors (the mat-vec identity)") {
    // emb(node, k) = (M v_k)(node) = lambda_k * v_k(node): check the
    // distributed integer mat-vec against the driver model, within
    // micro-rounding tolerance accumulated over V terms
    val dim = 2
    val vs = vectors(dim)
    val (_, model) = pipeline(dim)
    val idx = model.contexts.zipWithIndex.toMap
    for ((id, v) <- vs; k <- 0 until dim) {
      val expected = model.eigenvalues(k) * (model.vMicro(idx(id))(k) / 1e6) * 1e12
      val got = v(k).toDouble
      assert(math.abs(got - expected) <= 2e6 * model.nNodes,
        s"node $id dim $k: got $got, lambda*v = $expected")
    }
  }

  test("distributed orthogonal iteration recovers the driver eigenbasis") {
    val dim = 3
    val (ppmi, model) = pipeline(dim)
    val (qDf, eigs) = GraphEmbed.trainDistributed(ppmi, dim, iters = 30)
    val q = qDf.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(q.keySet === model.contexts.toSet, "same vocabulary")
    // Rayleigh magnitudes match the top singular values (|λ|, the
    // ordering both paths share)
    val top = model.eigenvalues.take(dim).map(math.abs)
    val gotAbs = eigs.map(math.abs).sorted.reverse
    gotAbs.zip(top).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 0.05 * math.max(1.0, want),
        s"|Rayleigh| $got vs |eigSym| $want")
    }
    // the absolute trace attains the top-dim singular sum — the
    // maximal property, rotation-invariant inside the subspace
    assert(gotAbs.sum >= 0.98 * top.sum, s"trace ${gotAbs.sum} vs ${top.sum}")
    // columns are orthonormal
    val cols = (0 until dim).map(k => model.contexts.map(id => q(id)(k)))
    for (a <- 0 until dim; b <- a until dim) {
      val dot = cols(a).zip(cols(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"cols $a,$b dot=$dot")
    }
  }

  test("asymmetric pair counts fail loudly") {
    val bad = Seq((1L, 2L, 5L), (2L, 1L, 7L)).toDF("center", "context", "ppmi_micro")
    val e = intercept[IllegalArgumentException] { GraphEmbed.train(bad, 1) }
    assert(e.getMessage.contains("symmetric"))
  }
}

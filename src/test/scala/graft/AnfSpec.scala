package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** HyperANF (GraphAnalytics.hyperANF): driver replay of the register
  * recurrence + estimator, ball-growth structure, determinism.
  */
class AnfSpec extends GraftSuite {
  import spark.implicits._

  // Path 1-2-3-4 plus an isolated pair 10-11.
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")

  private val B = 4
  private val M = 1 << B

  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"0|$s".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Exact replay: registers as (bucket -> maxRank) maps per vertex. */
  private def replay(es: Seq[(Long, Long)], rounds: Int): Map[(Long, Long), Long] = {
    val und = (es ++ es.map(e => (e._2, e._1))).filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).map { case (u, out) => u -> out.map(_._2) }
    val nodes = und.map(_._1).distinct
    val rest = 32 - B
    def own(id: Long): Map[Long, Long] = {
      val h = hash32(id.toString)
      val w = h % (1L << rest)
      // rank = (rest+1) - bitlength(w); toBinaryString has no leading zeros
      val rank = if (w == 0) (rest + 1).toLong
        else (rest + 1 - java.lang.Long.toBinaryString(w).length).toLong
      Map((h >> rest) -> rank)
    }
    var regs = nodes.map(n => n -> own(n)).toMap
    def merge(a: Map[Long, Long], b: Map[Long, Long]) =
      (a.keySet ++ b.keySet).map(k =>
        k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    def est(r: Map[Long, Long]): Long = {
      val z = r.values.map(rk => math.pow(2.0, -rk)).sum
      val nz = r.size
      val raw = 0.7213 / (1.0 + 1.079 / M) * M * M / (z + (M - nz))
      val e = if (raw <= 2.5 * M && nz < M) M.toDouble * math.log(M.toDouble / (M - nz))
        else raw
      math.round(BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    }
    val out = scala.collection.mutable.Map.empty[(Long, Long), Long]
    nodes.foreach(n => out((n, 0L)) = est(regs(n)))
    for (t <- 1 to rounds) {
      regs = nodes.map(n =>
        n -> adj(n).foldLeft(regs(n))((acc, u) => merge(acc, regs(u)))).toMap
      nodes.foreach(n => out((n, t.toLong)) = est(regs(n)))
    }
    out.toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    GraphAnalytics.hyperANF(df, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("matches the exact driver replay on the path graph") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    assert(run(edges, 3) === replay(es, 3))
  }

  test("balls grow monotonically and saturate at the component") {
    val got = run(edges, 3)
    for (id <- Seq(1L, 2L, 3L, 4L, 10L, 11L); t <- 1 to 3)
      assert(got((id, t.toLong)) >= got((id, t - 1L)), s"ball shrank at ($id, $t)")
    // isolated pair saturates at round 1: rounds 1..3 identical
    assert(got((10L, 1L)) === got((10L, 3L)))
    // path center reaches everything by round 2
    assert(got((2L, 2L)) === got((2L, 3L)))
  }

  test("deterministic across repartitioning") {
    assert(run(edges.repartition(5), 2) === run(edges, 2))
  }
}

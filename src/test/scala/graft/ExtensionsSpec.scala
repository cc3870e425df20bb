package graft

import org.apache.spark.sql.SparkSession

/** [[graft.functions.GraftExtensions]]: a session built with
  * `.withExtensions(new GraftExtensions)` (or the cluster-side
  * `spark.sql.extensions` conf) exposes EVERY native expression on
  * the SQL surface — the path a pure-SQL user (thriftserver, notebook
  * `%sql`) reaches the engine through, where per-object `register`
  * calls are not available.
  */
class ExtensionsSpec extends GraftSuite {

  test("an extensions-built session exposes all native functions in SQL") {
    val base = spark // force the shared session (and its context) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "extensions need a fresh session to apply")

      val r = s2.sql(
        """SELECT
          |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
          |  dot_float(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot,
          |  nearest_cell(array(1.0F, 0.0F),
          |               array(array(1.0F, 0.0F), array(0.0F, 1.0F))) AS nc,
          |  nearest_cells(array(1.0F, 0.0F),
          |                array(array(1.0F, 0.0F), array(0.0F, 1.0F)), 2) AS ncs,
          |  mat_vec(array(1.0F, 0.0F),
          |          array(array(0.0F, 1.0F), array(1.0F, 0.0F))) AS mv,
          |  pq_lut(array(1.0F, 0.0F),
          |         array(array(array(1.0F, 0.0F), array(0.0F, 1.0F)))) AS lut
          |""".stripMargin).head()

      assert(r.getDouble(0) == 1.0, "cosine_sim of a vector with itself")
      assert(r.getDouble(1) == 11.0, "dot_float(1·3 + 2·4)")
      assert(r.getInt(2) == 0, "nearest_cell argmin")
      assert(r.getSeq[Int](3) == Seq(0, 1), "nearest_cells ascending by distance")
      assert(r.getSeq[Float](4) == Seq(0f, 1f), "mat_vec row dots")
      // lut(0)(j) = |c_j|^2 - 2 q_s.c_j over the one subspace
      assert(r.getSeq[Seq[Double]](5) == Seq(Seq(-1.0, 1.0)), "pq_lut entries")

      // the optimizer rule rides along too (same injection point)
      assert(s2.sessionState.optimizer.batches.exists(
        _.rules.contains(graft.plans.EliminateUnusedUniqueJoin)),
        "injected optimizer rule must be in the session's optimizer")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}

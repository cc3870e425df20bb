package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diverse subset selection over an embedding corpus.
  *
  * Greedy k-center (farthest-first traversal, Gonzalez '85 — public
  * knowledge): start from the min-id vector, then repeatedly add the
  * point FARTHEST from the selected set. The classic 2-approximation
  * of the k-center objective, used in training-data curation to pick
  * a maximally diverse core-set (the opposite failure mode of random
  * sampling, which over-represents dense clusters).
  *
  * Deterministic & engine-exact: distances are micro-int cosine
  * distances (`1e6 - round(round(cos, 6)·1e6, 0)` — the
  * [[graft.functions.CosineSim]] discipline), the argmax tie-breaks
  * by smallest id, and the per-point running min is a `least` of
  * integers — so the full selection trace replays identically in
  * SQL.
  *
  * Scale: the state is ONE narrow frame (id, vec, mind) refreshed by
  * a per-round map against the newest center (broadcast as a
  * literal); each round is one scan + one TakeOrdered(1) — no
  * shuffles besides the argmax reduction, no N×N distance matrix.
  * Driver holds k rows (id + vector per center), never the corpus.
  */
object Diversity {

  /** Returns every point as (idCol, sel_order, mind_micro):
    * sel_order = 1..k for the chosen centers (their own final min
    * distance is 0), 0 otherwise; mind_micro = final micro-int
    * cosine distance to the nearest selected center.
    */
  def kCenter(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.functions.CosineSim.register(spark)
    import spark.implicits._

    def distTo(center: Seq[Float]) =
      lit(1000000L) - round(round(
        graft.functions.CosineSim.col(col(vecCol), graft.functions.Lits.floats(center)), 6) * 1000000, 0)
        .cast("long")

    val seed = emb.orderBy(col(idCol)).limit(1)
      .select(col(idCol), col(vecCol)).head()
    var centers = List((seed.getLong(0), 1L))
    var m = emb.select(col(idCol), col(vecCol),
      distTo(seed.getSeq[Float](1)).as("mind")).localCheckpoint()
    for (r <- 2 to k) {
      val c = m.orderBy(col("mind").desc, col(idCol).asc).limit(1)
        .select(col(idCol), col(vecCol)).head()
      centers ::= (c.getLong(0), r.toLong)
      m = m.select(col(idCol), col(vecCol),
        least(col("mind"), distTo(c.getSeq[Float](1))).as("mind")).localCheckpoint()
    }
    val selDf = centers.toDF(idCol, "sel_order")
    m.join(broadcast(selDf), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("sel_order"), lit(0L)).as("sel_order"),
        col("mind").as("mind_micro"))
  }
}

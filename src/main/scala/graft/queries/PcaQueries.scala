package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.Pca
import graft.sources.Tables

/** PCA projection gate: the oracle re-derives the full centered
  * MatVec product in SQL — float subtract, double dot left-to-right,
  * one float rounding per output dim — from the projection matrix the
  * run itself trained (deferred render, the OPQ pattern).
  */
object PcaQueries extends QueryModule {

  private object State {
    @volatile var model: Option[Pca.PcaModel] = None
  }

  private def dlit(x: Double): String = s"'$x'::DOUBLE"

  /** Output dim i of the centered projection, mirroring MatVec on the
    * float-centered vector: w_ij (double) × centered_j (float→double),
    * summed ascending, rounded once through FLOAT.
    */
  private def projSql(m: Pca.PcaModel, i: Int, src: String): String = {
    val terms = m.projection(i).zipWithIndex.map { case (w, j) =>
      s"${dlit(w.toDouble)} * CAST((CAST($src[${j + 1}] AS FLOAT) - '${m.mean(j).toDouble}'::FLOAT) AS DOUBLE)"
    }.mkString(" + ")
    s"CAST(CAST(($terms) AS FLOAT) AS DOUBLE)"
  }

  override def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_embed_pca",
      "PCA 64->8 projection of every embedding (exact distributed moments, MatVec apply)",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        val model = Pca.train(s, emb, "vec_id", "embedding", dOut = 8)
        State.model = Some(model)
        val proj = Pca.project(col("embedding"), model)
        emb.select(
          (col("vec_id") +:
            (0 until model.dOut).map(i =>
              element_at(proj, i + 1).cast("double").as(s"p$i"))): _*)
      },
      Oracle.deferred {
        val m = State.model.getOrElse(throw new IllegalStateException(
          "PCA model not recorded — run q_embed_pca before rendering its oracle"))
        val cols = (0 until m.dOut)
          .map(i => s"${projSql(m, i, "e")} AS p$i").mkString(",\n")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
           |SELECT vec_id,
           |$cols
           |FROM v""".stripMargin
      }
    )
  )
}

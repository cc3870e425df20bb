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
    @volatile var annModel: Option[Pca.PcaModel] = None
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
    ),

    // ---- ANN composed over the reduced space ----
    // Brute-force cosine top-10 in the 8-dim PCA space: the query
    // projects driver-side through the same bit-exact arithmetic, so
    // the oracle can re-derive corpus AND query projections and the
    // scores agree to the rounded digit. The 100 TB point: the scan
    // reads 8 floats/vector instead of 64 — PCA is the cheap
    // compression tier below SQ8 when recall targets allow it.
    QueryDef(
      "q_ann_pca",
      "top-10 cosine neighbors of vec 0 in the 8-dim PCA space",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        val model = Pca.train(s, emb, "vec_id", "embedding", dOut = 8)
        State.annModel = Some(model)
        val proj = emb.select(col("vec_id"),
          Pca.project(col("embedding"), model).as("embedding"))
        val q = Pca.driverProject(model,
          emb.filter(col("vec_id") === 0L).select(col("embedding"))
            .head().getSeq[Float](0).toArray)
        graft.pipeline.Similarity.topK(proj.filter(col("vec_id") =!= 0L),
          "vec_id", "embedding", q.toSeq, 10, graft.functions.CosineSim.col)
      },
      Oracle.deferred {
        val m = State.annModel.getOrElse(throw new IllegalStateException(
          "PCA ANN model not recorded — run q_ann_pca before rendering its oracle"))
        val proj = (0 until m.dOut).map(i => projSql(m, i, "e")).mkString("[", ",\n", "]")
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |v AS (SELECT vec_id, $proj AS e FROM v0),
           |q AS (SELECT e AS qv FROM v WHERE vec_id = 0)
           |SELECT vec_id, round(list_dot_product(e, qv) /
           |  (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
           |FROM v, q WHERE vec_id <> 0
           |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin
      }
    )
  )
}

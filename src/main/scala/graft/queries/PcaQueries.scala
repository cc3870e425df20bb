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

  import AnnOracleSql.{argminSql, euclidDistSql, probeListSql}

  private object State {
    @volatile var model: Option[Pca.PcaModel] = None
    @volatile var annModel: Option[Pca.PcaModel] = None
    @volatile var tier: Option[(Pca.PcaModel, Array[Array[Float]])] = None
  }

  /** Ingest-cost pattern: project + train coarse cells + publish the
    * reduced-space layout once per (session, sfDir).
    */
  private def ivfPcaLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Pca.PcaModel, graft.pipeline.Ivf.IvfIndex, String) =
    SessionPublish.once(s, s"ivfpca|$dir") {
      val model = Pca.train(s, Tables(s, dir).embeddings, "vec_id", "embedding",
        dOut = 8)
      val path = SessionPublish.tempDir("graft-ivfpca") + "/layout"
      val coarse = Pca.writePartitionedPca(s, Tables(s, dir).embeddings,
        "vec_id", "embedding", model, nlist = 8, path)
      (model, coarse, path)
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
    ),

    // ---- the full PCA TIER: partitioned reduced-space layout,
    // probe-pruned shortlist, exact rerank ----
    // File pruning × an 8× cheaper scan payload, then raw-vector
    // rerank of only the shortlist (the SQ/PQ production-read shape
    // at the cheapest tier). The oracle re-derives EVERY stage:
    // projection, coarse argmin in the reduced space, the probe list
    // from the projected query, the reduced-space cosine shortlist,
    // and the exact raw-cosine rerank.
    QueryDef(
      "q_ann_ivfpca_rerank",
      "PCA-tier top-10: probe 2/8 reduced-space cells, 30-candidate exact rerank",
      (s, dir) => {
        val (model, coarse, path) = ivfPcaLayout(s, dir)
        State.tier = Some((model, coarse.centroids))
        val q = Tables(s, dir).embeddings.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        Pca.topKRerankPartitionedPca(s, path, Tables(s, dir).embeddings,
          "vec_id", "embedding", model, coarse, q, k = 10, candidates = 30,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (m, cents) = State.tier.getOrElse(throw new IllegalStateException(
          "PCA tier state not recorded — run q_ann_ivfpca_rerank before its oracle"))
        val proj = (0 until m.dOut).map(i => projSql(m, i, "e")).mkString("[", ",\n", "]")
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |vp AS (SELECT vec_id, $proj AS p FROM v0),
           |a AS (SELECT vec_id, p, ${argminSql(cents, "p")} AS cell FROM vp),
           |q AS (SELECT p AS qp FROM vp WHERE vec_id = 0),
           |pr AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qp")} AS probes FROM q),
           |sl AS (SELECT a.vec_id,
           |        round(list_dot_product(a.p, q.qp) /
           |          (sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(q.qp, q.qp))), 6) AS cosr
           |      FROM a, pr, q
           |      WHERE a.vec_id <> 0 AND list_contains(pr.probes, a.cell)
           |      ORDER BY cosr DESC, a.vec_id ASC LIMIT 30),
           |qe AS (SELECT e AS qv FROM v0 WHERE vec_id = 0)
           |SELECT r.vec_id, round(list_dot_product(r.e, qe.qv) /
           |  (sqrt(list_dot_product(r.e, r.e)) * sqrt(list_dot_product(qe.qv, qe.qv))), 6) AS cos
           |FROM v0 r JOIN sl ON r.vec_id = sl.vec_id CROSS JOIN qe
           |ORDER BY cos DESC, r.vec_id ASC LIMIT 10""".stripMargin
      }
    )
  )
}

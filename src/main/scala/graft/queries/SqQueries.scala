package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Sq}
import graft.sources.Tables

/** Scalar-quantization (SQ8) gate queries — the 4x tier between raw
  * vectors and PQ. Training-dependent (the per-dim ranges exist only
  * after the min/max pass), so the oracles are DEFERRED: the build
  * records the trained index + scoring weights, and the oracle
  * re-derives every vector's codes (per-dim clamped floor-round over
  * literal lo/step) and the score (bias + w1.c + w2.c^2, summed
  * left-to-right) in SQL — codes and micro scores must agree
  * bit-for-bit. Unlike PQ there is no 256-entry argmin, so the whole
  * oracle stays in per-row formula form (no join needed, scale-stable
  * by construction).
  */
object SqQueries extends QueryModule {

  private object State {
    @volatile var flat: Option[(Sq.SqIndex, Sq.SqLut)] = None
    @volatile var ivfsq: Option[(Array[Array[Float]], Sq.SqIndex, Sq.SqLut)] = None
    // (index, per-query weights) for the batch join gate — the column
    // form computed by graft.functions.SqWeights is bit-for-bit
    // Sq.sqLut (SqBatchSpec-pinned), so the driver re-derivation is
    // the exact literal
    @volatile var batch: Option[(Sq.SqIndex, Seq[(Long, Sq.SqLut)])] = None
    // (coarse centroids, index, weights) for the shortlist→rerank gate
    @volatile var rerank: Option[(Array[Array[Float]], Sq.SqIndex, Sq.SqLut)] = None
  }

  /** Train + publish the flat codes table once per (application, dir). */
  private def sqLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Sq.SqIndex, String) =
    SessionPublish.once(s, s"sqcodes|$dir") {
      val emb = Tables(s, dir).embeddings
      val idx = Sq.train(s, emb, "embedding")
      val path = SessionPublish.tempDir("graft-sq") + "/codes"
      Sq.writeCodes(emb, "vec_id", "embedding", idx, path)
      (idx, path)
    }

  /** Coarse cells + SQ codes in one partitioned layout, once per
    * (application, dir).
    */
  private def ivfSqLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Ivf.IvfIndex, Sq.SqIndex, String) =
    SessionPublish.once(s, s"ivfsq|$dir") {
      val emb = Tables(s, dir).embeddings
      val coarse = Ivf.train(s, emb, "vec_id", "embedding", nlist = 8)
      val idx = Sq.train(s, emb, "embedding")
      val path = SessionPublish.tempDir("graft-ivfsq") + "/layout"
      Sq.writePartitionedSq(emb, "vec_id", "embedding", coarse, idx, path)
      (coarse, idx, path)
    }

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Array[Float] =
    Tables(s, dir).embeddings.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  import AnnOracleSql.{argminSql, dlit, euclidDistSql, probeListSql}

  /** The per-dim code list: clamp(floor((e[d] - lo_d)/step_d + 0.5))
    * with [[Sq.encode]]'s exact double arithmetic and clamp order
    * (floor first, then greatest/least — integer-exact either way,
    * emitted in the same order for clarity).
    */
  private def codeSql(idx: Sq.SqIndex, e: String): String =
    (0 until idx.dim).map { d =>
      s"CAST(least(greatest(floor(($e[${d + 1}] - ${dlit(idx.lo(d).toDouble)}) / " +
        s"${dlit(idx.step(d))} + ${dlit(0.5)}), 0), 255) AS INT)"
    }.mkString("[", ",\n", "]")

  /** `bias + SUM_d (w1_d * c + w2_d * (c*c))` — [[Sq.sqScore]]'s exact
    * fold: left-to-right over dims, each term (w1*c) + (w2*(c*c)).
    */
  private def scoreSql(lut: Sq.SqLut, c: String): String =
    (dlit(lut.bias) +: lut.w1.indices.map { d =>
      val cd = s"CAST($c[${d + 1}] AS DOUBLE)"
      s"(${dlit(lut.w1(d))} * $cd + ${dlit(lut.w2(d))} * ($cd * $cd))"
    }).mkString(" + ")

  override def queries: Seq[QueryDef] = Seq(
    // ---- SQ8 top-k over the published codes table ----
    // The 4x tier: dim byte codes score as one constant plus dim
    // multiply-adds — no vector arithmetic at scan time, recon error
    // bounded by step/2 per dim (vs PQ's codebook residual).
    QueryDef(
      "q_sq8_topk",
      "SQ8 top-10 over the published per-dim-quantized codes table",
      (s, dir) => {
        val (idx, path) = sqLayout(s, dir)
        val q = queryVec(s, dir)
        State.flat = Some((idx, Sq.sqLut(idx, q)))
        Sq.topKSq(s, s.read.parquet(path), "vec_id", idx, q, k = 10,
          pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (idx, lut) = State.flat.getOrElse(throw new IllegalStateException(
          "SQ index not recorded — run q_sq8_topk before rendering its oracle"))
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           |           WHERE vec_id <> 0),
           |c AS (SELECT vec_id, ${codeSql(idx, "e")} AS c FROM v)
           |SELECT vec_id, CAST(floor((${scoreSql(lut, "c")}) * 1e6) AS BIGINT) AS sq_micros
           |FROM c ORDER BY sq_micros ASC, vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ---- production read path: SQ shortlist -> exact rerank ----
    // Probe-pruned SQ shortlist over the partitioned codes, then an
    // exact cosine re-rank of ONLY the shortlisted ids against the
    // raw corpus (pushed In filter — no join, no corpus shuffle).
    // The oracle re-derives codes -> probe list -> SQ shortlist ->
    // exact cosine end-to-end.
    QueryDef(
      "q_ann_ivfsq_rerank",
      "IVF-SQ shortlist (30 of 2/8 cells) re-ranked exactly by cosine, top-10",
      (s, dir) => {
        val (coarse, idx, path) = ivfSqLayout(s, dir)
        val q = queryVec(s, dir)
        State.rerank = Some((coarse.centroids, idx, Sq.sqLut(idx, q)))
        Sq.topKRerankPartitionedSq(s, path, Tables(s, dir).embeddings,
          "vec_id", "embedding", coarse, idx, q, k = 10, candidates = 30,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, idx, lut) = State.rerank.getOrElse(throw new IllegalStateException(
          "rerank state not recorded — run q_ann_ivfsq_rerank before its oracle"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v0),
           |q AS (SELECT e AS qv FROM v0 WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |v AS (SELECT a.vec_id, a.e, a.cell FROM a, p
           |      WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)),
           |c AS (SELECT vec_id, ${codeSql(idx, "e")} AS c FROM v),
           |sl AS (SELECT vec_id,
           |        CAST(floor((${scoreSql(lut, "c")}) * 1e6) AS BIGINT) AS sq_micros
           |      FROM c ORDER BY sq_micros ASC, vec_id ASC LIMIT 30)
           |SELECT r.vec_id, round(list_dot_product(r.e, q.qv) /
           |  (sqrt(list_dot_product(r.e, r.e)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
           |FROM v0 r JOIN sl ON r.vec_id = sl.vec_id CROSS JOIN q
           |ORDER BY cos DESC, r.vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ---- batch SQ kNN join (probe-all) ----
    // One query SET against the partitioned SQ layout: per-query
    // weights ride the broadcast side as one SqWeights column, codes
    // never shuffle. The oracle re-derives each query's weights
    // driver-side (bit-equal to the column form, SqBatchSpec) and
    // scores every corpus vector per query with the same ordered
    // fold — a UNION ALL branch per query keeps the sum in exact
    // per-row formula form.
    QueryDef(
      "q_ann_sq_topk_batch",
      "batch SQ top-10 for queries vec_id<3 over the IVF-SQ layout (probe-all)",
      (s, dir) => {
        val (coarse, idx, path) = ivfSqLayout(s, dir)
        val emb = Tables(s, dir).embeddings
        val qs = emb.filter(col("vec_id") < 3)
        State.batch = Some((idx,
          qs.select(col("vec_id"), col("embedding")).collect().toSeq
            .map(r => r.getLong(0) -> Sq.sqLut(idx, r.getSeq[Float](1).toArray))
            .sortBy(_._1)))
        Sq.topKBatchSq(s, path, qs, "vec_id", "embedding", "vec_id",
          coarse, idx, k = 10, nprobe = coarse.nlist,
          pairFilter = col("q_id") =!= col("vec_id"))
      },
      Oracle.deferred {
        val (idx, luts) = State.batch.getOrElse(throw new IllegalStateException(
          "batch SQ state not recorded — run q_ann_sq_topk_batch before its oracle"))
        val branches = luts.map { case (qId, lut) =>
          s"""SELECT $qId AS q_id, vec_id,
             |  CAST(floor((${scoreSql(lut, "c")}) * 1e6) AS BIGINT) AS sq_micros
             |FROM c WHERE vec_id <> $qId""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |c AS (SELECT vec_id, ${codeSql(idx, "e")} AS c FROM v),
           |sc AS (
           |$branches),
           |rk AS (SELECT q_id, vec_id, sq_micros, row_number() OVER (
           |        PARTITION BY q_id ORDER BY sq_micros ASC, vec_id ASC) AS r FROM sc)
           |SELECT CAST(q_id AS BIGINT) AS q_id, vec_id, sq_micros
           |FROM rk WHERE r <= 10 ORDER BY q_id, sq_micros, vec_id""".stripMargin
      }
    ),

    // ---- IVF-SQ: coarse cells prune FILES, codes shrink BYTES 4x ----
    // nprobe=2 of 8: the scan lists 1/4 of the directories and reads
    // dim-byte codes inside them. The oracle composes the coarse-cell
    // argmin (NearestCell arithmetic), the euclidean probe list
    // (probeOrder arithmetic), and the SQ scoring formula — every
    // stage of the approximate path re-derived exactly.
    QueryDef(
      "q_ann_ivfsq",
      "IVF-SQ top-10: probe 2/8 cells of the partitioned SQ8 layout",
      (s, dir) => {
        val (coarse, idx, path) = ivfSqLayout(s, dir)
        val q = queryVec(s, dir)
        State.ivfsq = Some((coarse.centroids, idx, Sq.sqLut(idx, q)))
        Sq.topKPartitionedSq(s, path, "vec_id", coarse, idx, q, k = 10,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, idx, lut) = State.ivfsq.getOrElse(throw new IllegalStateException(
          "IVF-SQ state not recorded — run q_ann_ivfsq before rendering its oracle"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v0),
           |q AS (SELECT e AS qv FROM v0 WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |v AS (SELECT a.vec_id, a.e, a.cell FROM a, p
           |      WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)),
           |c AS (SELECT vec_id, cell, ${codeSql(idx, "e")} AS c FROM v)
           |SELECT vec_id, CAST(floor((${scoreSql(lut, "c")}) * 1e6) AS BIGINT) AS sq_micros,
           |       cell
           |FROM c ORDER BY sq_micros ASC, vec_id ASC LIMIT 10""".stripMargin
      }
    )
  )
}

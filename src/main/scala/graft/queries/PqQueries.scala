package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Pq}
import graft.sources.Tables

/** Product-quantization gate queries: ADC top-k over a published codes
  * table, and IVF-PQ (file pruning × byte shrinking composed).
  *
  * Both are training-dependent — codes and LUTs exist only after the
  * codebooks are trained — so the oracles are DEFERRED: the build
  * records the trained codebooks/centroids/LUT, and the oracle
  * re-derives every vector's codes (per-subspace argmin with
  * [[graft.functions.NearestCell]]'s exact arithmetic over codebook
  * literals) and the ADC score (LUT entries as literal DOUBLE lists,
  * summed left-to-right) in SQL. Scores are integer micros
  * (floor(adc·1e6)) — floor of a bit-identical double is
  * engine-stable where decimal rounding is not.
  */
object PqQueries extends QueryModule {

  private val NSUB = 8
  // the canonical byte-PQ width — deliberately > 128 so the gate
  // exercises the unsigned read of TINYINT-stored codes (PqSpec pins
  // the 255 round-trip; this pins it end-to-end against DuckDB)
  private val KSUB = 256

  private object State {
    @volatile var adc: Option[(Pq.PqIndex, Array[Array[Double]])] = None
    @volatile var ivfpq: Option[(Array[Array[Float]], Pq.PqIndex, Array[Array[Double]])] = None
  }

  /** Train + publish the codes table once per (application, dir) —
    * ingest cost, like the IVF layout publish; the query lines then
    * measure the read-side payoff (a codes scan reads nsub bytes per
    * row instead of dim floats).
    */
  private def pqLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Pq.PqIndex, String) =
    SessionPublish.once(s, s"pqcodes|$dir") {
      val emb = Tables(s, dir).embeddings
      val idx = Pq.train(s, emb, "vec_id", "embedding", NSUB, KSUB)
      val path = SessionPublish.tempDir("graft-pq") + "/codes"
      Pq.writeCodes(emb, "vec_id", "embedding", idx, path)
      (idx, path)
    }

  /** Coarse cells + PQ codes in one partitioned layout, once per
    * (application, dir).
    */
  private def ivfPqLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Ivf.IvfIndex, Pq.PqIndex, String) =
    SessionPublish.once(s, s"ivfpq|$dir") {
      val emb = Tables(s, dir).embeddings
      val coarse = Ivf.train(s, emb, "vec_id", "embedding", nlist = 8)
      val pq = Pq.train(s, emb, "vec_id", "embedding", NSUB, KSUB)
      val path = SessionPublish.tempDir("graft-ivfpq") + "/layout"
      Pq.writePartitionedPq(emb, "vec_id", "embedding", coarse, pq, path)
      (coarse, pq, path)
    }

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Array[Float] =
    Tables(s, dir).embeddings.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  // ---- SQL rendering over the recorded training state ----
  import AnnOracleSql.{argminSql, dlit, euclidDistSql, probeListSql}

  /** c0..c(nsub-1): each subspace's code for the DOUBLE[] column `v`. */
  private def codeCols(pq: Pq.PqIndex, v: String): String =
    pq.codebooks.zipWithIndex.map { case (cb, s) =>
      s"${argminSql(cb, v, off = s * pq.dsub)} AS c$s"
    }.mkString(",\n        ")

  /** floor((lut0[c0+1] + lut1[c1+1] + ...) * 1e6) — [[Pq.adcMicros]]'s
    * exact arithmetic with the LUT rows as literal DOUBLE lists.
    */
  private def adcMicrosSql(lut: Array[Array[Double]]): String = {
    val terms = lut.zipWithIndex.map { case (l, s) =>
      s"([${l.map(dlit).mkString(", ")}])[c$s + 1]"
    }.mkString(" + ")
    s"CAST(floor(($terms) * 1e6) AS BIGINT)"
  }

  override def queries: Seq[QueryDef] = Seq(
    // ---- ADC top-k over the published codes table ----
    // The compressed ANN tier: nsub=8 codes (8 bytes) score against a
    // per-query LUT — no vector arithmetic at scan time, 32x less I/O
    // than raw vectors. The oracle re-derives codes AND scores from
    // the recorded codebooks, so rows, codes, and micro scores must
    // all agree bit-for-bit.
    QueryDef(
      "q_pq_adc",
      s"PQ ADC top-10 (nsub=$NSUB, ksub=$KSUB) over the published codes table",
      (s, dir) => {
        val (idx, path) = pqLayout(s, dir)
        val q = queryVec(s, dir)
        State.adc = Some((idx, Pq.adcLut(idx, q)))
        Pq.topKAdc(s, s.read.parquet(path), "vec_id", idx, q, k = 10,
          pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (idx, lut) = State.adc.getOrElse(throw new IllegalStateException(
          "PQ codebooks not recorded — run q_pq_adc before rendering its oracle"))
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |c AS (SELECT vec_id,
           |        ${codeCols(idx, "e")}
           |      FROM v WHERE vec_id <> 0)
           |SELECT vec_id, ${adcMicrosSql(lut)} AS adc_micros
           |FROM c ORDER BY adc_micros ASC, vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ---- IVF-PQ: coarse cells prune FILES, codes shrink BYTES ----
    // nprobe=2 of 8: the scan lists 1/4 of the directories and reads
    // 8-byte codes inside them. The oracle composes the coarse-cell
    // argmin (NearestCell arithmetic), the euclidean probe list
    // (probeOrder arithmetic), and the ADC scoring — every stage of
    // the approximate path re-derived exactly.
    QueryDef(
      "q_ann_ivfpq",
      s"IVF-PQ top-10: probe 2/8 cells of the partitioned codes layout, ADC scores",
      (s, dir) => {
        val (coarse, pq, path) = ivfPqLayout(s, dir)
        val q = queryVec(s, dir)
        State.ivfpq = Some((coarse.centroids, pq, Pq.adcLut(pq, q)))
        Pq.topKPartitionedPq(s, path, "vec_id", coarse, pq, q, k = 10,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, pq, lut) = State.ivfpq.getOrElse(throw new IllegalStateException(
          "IVF-PQ state not recorded — run q_ann_ivfpq before rendering its oracle"))
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v),
           |q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |c AS (SELECT a.vec_id, a.cell,
           |        ${codeCols(pq, "a.e")}
           |      FROM a, p WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell))
           |SELECT vec_id, ${adcMicrosSql(lut)} AS adc_micros, cell
           |FROM c ORDER BY adc_micros ASC, vec_id ASC LIMIT 10""".stripMargin
      }
    )
  )
}

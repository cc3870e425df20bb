package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Opq, Pq}
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
    // (coarse centroids, residual codebook, per-probed-cell LUTs)
    @volatile var ivfpqResidual: Option[(Array[Array[Float]], Pq.PqIndex,
      Seq[(Int, Array[Array[Double]])])] = None
    // (codebooks, per-query-id LUTs) for the batch ADC join gate
    @volatile var batch: Option[(Pq.PqIndex, Seq[(Long, Array[Array[Double]])])] = None
    // (coarse centroids, base-trained codebooks, LUT) for the
    // incremental-append gate
    @volatile var ivfpqInc: Option[(Array[Array[Float]], Pq.PqIndex, Array[Array[Double]])] = None
    // (coarse centroids, codebooks, LUT) for the shortlist→rerank gate
    @volatile var rerank: Option[(Array[Array[Float]], Pq.PqIndex, Array[Array[Double]])] = None
    // (trained OPQ index, rotated-query LUT) for the OPQ ADC gate
    @volatile var opq: Option[(Opq.OpqIndex, Array[Array[Double]])] = None
    // (rotated-space coarse centroids, OPQ index, rotated-query LUT)
    // for the OPQ partitioned-tier gate
    @volatile var ivfpqOpq: Option[(Array[Array[Float]], Opq.OpqIndex,
      Array[Array[Double]])] = None
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

  /** Residual (IVFADC) layout: shared codebook trained on
    * v - centroid(cell), once per (application, dir).
    */
  private def ivfPqResidualLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Ivf.IvfIndex, Pq.PqIndex, String) =
    SessionPublish.once(s, s"ivfpqres|$dir") {
      val emb = Tables(s, dir).embeddings
      val coarse = Ivf.train(s, emb, "vec_id", "embedding", nlist = 8)
      val pq = Pq.trainResidual(s, emb, "vec_id", "embedding", coarse, NSUB, KSUB)
      val path = SessionPublish.tempDir("graft-ivfpq-res") + "/layout"
      Pq.writePartitionedPqResidual(emb, "vec_id", "embedding", coarse, pq, path)
      (coarse, pq, path)
    }

  /** Incremental-ingestion layout for the compressed tier: train +
    * publish on the BASE corpus (vec_id % 5 != 0 besides the query
    * vector), then APPEND the batch's codes with the frozen indexes —
    * the IVF-PQ twin of the raw-vector `ivfIncrementalLayout`.
    */
  private def ivfPqIncrementalLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Ivf.IvfIndex, Pq.PqIndex, String) =
    SessionPublish.once(s, s"ivfpqinc|$dir") {
      val emb   = Tables(s, dir).embeddings
      val base  = emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") === 0L)
      val batch = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0L)
      val coarse = Ivf.train(s, base, "vec_id", "embedding", nlist = 8)
      val pqi = Pq.train(s, base, "vec_id", "embedding", NSUB, KSUB)
      val path = SessionPublish.tempDir("graft-ivfpq-inc") + "/layout"
      Pq.writePartitionedPq(base, "vec_id", "embedding", coarse, pqi, path)
      Pq.appendPartitionedPq(batch, "vec_id", "embedding", coarse, pqi, path)
      (coarse, pqi, path)
    }

  /** Train + publish the OPQ codes table once per (application, dir) —
    * same ingest-cost pattern as [[pqLayout]], with the learned
    * rotation fused into the encode scan.
    */
  private def opqLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Opq.OpqIndex, String) =
    SessionPublish.once(s, s"opqcodes|$dir") {
      val emb = Tables(s, dir).embeddings
      val idx = Opq.train(s, emb, "vec_id", "embedding", NSUB, KSUB)
      val path = SessionPublish.tempDir("graft-opq") + "/codes"
      Opq.writeCodes(emb, "vec_id", "embedding", idx, path)
      (idx, path)
    }

  /** OPQ in the partitioned tier: learned rotation, then coarse cells
    * AND codebooks trained in the ROTATED space, one rotation-guarded
    * layout — once per (application, dir).
    */
  private def ivfPqOpqLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (Ivf.IvfIndex, Opq.OpqIndex, String) =
    SessionPublish.once(s, s"ivfpqopq|$dir") {
      val emb = Tables(s, dir).embeddings
      val idx = Opq.train(s, emb, "vec_id", "embedding", NSUB, KSUB)
      val coarse = Opq.trainCoarse(s, emb, "vec_id", "embedding", idx, nlist = 8)
      val path = SessionPublish.tempDir("graft-ivfpq-opq") + "/layout"
      Opq.writePartitionedOpq(emb, "vec_id", "embedding", coarse, idx, path)
      (coarse, idx, path)
    }

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Array[Float] =
    Tables(s, dir).embeddings.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  // ---- SQL rendering over the recorded training state ----
  //
  // The codebook is emitted as a VALUES TABLE and codes come from a
  // streamed cross-join + group-by argmin, NOT from per-row literal
  // lists: a `list_sort([[dist, j], ...])` over ksub=256 entries
  // builds the whole literal list per row per subspace, and DuckDB
  // ran out of memory on it at the 10x corpus — the join form is
  // pipelined and scale-stable (same row values, same tie rule).
  import AnnOracleSql.{argminSql, dlit, euclidDistSql, probeListSql}

  /** `(s, j, c2, entry)` rows of the codebook, c2 = |entry|² with
    * NearestCell's left-to-right fold, entry as a DOUBLE list.
    */
  private def codebookValuesSql(pq: Pq.PqIndex): String =
    pq.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, j) =>
        val entry = c.map(x => dlit(x.toDouble)).mkString("[", ", ", "]")
        s"($s, $j, ${dlit(AnnOracleSql.c2Of(c))}, $entry)"
      }
    }.mkString(",\n")

  /** `(s, j, val)` rows of the per-query ADC lookup table. */
  private def lutValuesSql(lut: Array[Array[Double]]): String =
    lut.zipWithIndex.flatMap { case (l, s) =>
      l.zipWithIndex.map { case (v, j) => s"($s, $j, ${dlit(v)})" }
    }.mkString(",\n")

  /** `(q_id, s, j, val)` rows — one LUT per QUERY of the batch join
    * gate (the column form computed by [[graft.functions.PqLut]] is
    * bit-for-bit [[Pq.adcLut]], PqBatchSpec-pinned, so the driver
    * re-derivation is the exact literal).
    */
  private def lutValuesPerQuerySql(luts: Seq[(Long, Array[Array[Double]])]): String =
    luts.flatMap { case (qId, lut) =>
      lut.zipWithIndex.toSeq.flatMap { case (l, s) =>
        l.zipWithIndex.toSeq.map { case (v, j) => s"($qId, $s, $j, ${dlit(v)})" }
      }
    }.mkString(",\n")

  /** `(cell, s, j, val)` rows — one LUT per probed cell (residual
    * search: the query residual differs per cell).
    */
  private def lutValuesPerCellSql(luts: Seq[(Int, Array[Array[Double]])]): String =
    luts.flatMap { case (cell, lut) =>
      lut.zipWithIndex.toSeq.flatMap { case (l, s) =>
        l.zipWithIndex.toSeq.map { case (v, j) => s"($cell, $s, $j, ${dlit(v)})" }
      }
    }.mkString(",\n")

  /** The rotated vector as a DOUBLE list: each output dim is the
    * row·vector dot summed left-to-right in doubles (promoted float
    * weights × promoted float elements — [[graft.functions.MatVec]]'s
    * exact arithmetic) with ONE rounding through FLOAT, then promoted
    * back to DOUBLE for the codes argmin.
    */
  private def rotatedSql(rot: Array[Array[Float]], src: String): String =
    rot.map { row =>
      val terms = row.zipWithIndex
        .map { case (w, j) => s"${dlit(w.toDouble)} * $src[${j + 1}]" }
        .mkString(" + ")
      s"CAST(CAST(($terms) AS FLOAT) AS DOUBLE)"
    }.mkString("[", ",\n", "]")

  /** The coarse centroid matrix as a FLOAT[][] literal — residual
    * re-derivation must subtract in FLOAT to reproduce the Spark
    * side's float rounding bit-for-bit.
    */
  private def floatMatrixSql(cents: Array[Array[Float]]): String =
    cents.map(_.map(x => s"'${x.toDouble}'::FLOAT").mkString("[", ", ", "]"))
      .mkString("[", ",\n", "]")

  /** `|entry|² - 2 · entry·subvec` for the joined codebook row: the
    * dot terms index the vector column `e` at the subspace offset
    * (`cb.s * dsub + d`), summed left-to-right — [[Pq.encode]]'s
    * exact arithmetic with the entry elements promoted to DOUBLE.
    */
  private def joinDistSql(dsub: Int, e: String): String = {
    val dot = (1 to dsub).map(d => s"cb.entry[$d] * $e[cb.s * $dsub + $d]").mkString(" + ")
    s"cb.c2 - 2.0 * ($dot)"
  }

  /** Shared oracle tail (CTEs `scored`..`pc` + final SELECT): codes
    * via grouped lexicographic argmin over the joined codebook (ties
    * to the lower j — NearestCell's strict-< first-wins rule),
    * per-subspace LUT values joined back, then summed s=0..nsub-1
    * left-to-right ([[Pq.adcScore]]'s reduceLeft order) and floored
    * to micros. `src` is a CTE exposing (vec_id, e) plus any `carry`
    * columns, which ride through to the output (e.g. `cell`).
    */
  private def adcSumSql(pq: Pq.PqIndex): String =
    pq.codebooks.indices.map(s => s"v$s").mkString(" + ")

  /** The CTE chain `scored`..`pc` only (no final SELECT) — shared
    * between the plain ADC tails and the rerank gate, which needs the
    * shortlist as a further CTE instead of the query result.
    */
  private def codesAdcCtes(pq: Pq.PqIndex, src: String, carry: Seq[String],
      lutPerCell: Boolean): String = {
    val keys = "vec_id" +: carry
    val k = keys.mkString(", ")
    val srcK = keys.map("src." + _).mkString(", ")
    val codesK = keys.map("codes." + _).mkString(", ")
    val vdefs = pq.codebooks.indices
      .map(s => s"max(CASE WHEN s = $s THEN val END) AS v$s").mkString(", ")
    val lutOn = (if (lutPerCell) "lut.cell = codes.cell AND " else "") +
      "lut.s = codes.s AND lut.j = codes.code"
    s"""scored AS (SELECT $srcK, cb.s, cb.j,
       |        ${joinDistSql(pq.dsub, "src.e")} AS d
       |      FROM $src src CROSS JOIN cb),
       |codes AS (SELECT $k, s,
       |        CAST(min([d, CAST(j AS DOUBLE)])[2] AS INT) AS code
       |      FROM scored GROUP BY $k, s),
       |vals AS (SELECT $codesK, codes.s, lut.val
       |      FROM codes JOIN lut ON $lutOn),
       |pc AS (SELECT $k, $vdefs
       |      FROM vals GROUP BY $k)""".stripMargin
  }

  private def codesAdcSql(pq: Pq.PqIndex, src: String, carry: Seq[String] = Nil,
      lutPerCell: Boolean = false): String = {
    val outCarry = carry.map(", " + _).mkString
    s"""${codesAdcCtes(pq, src, carry, lutPerCell)}
       |SELECT vec_id, CAST(floor((${adcSumSql(pq)}) * 1e6) AS BIGINT) AS adc_micros$outCarry
       |FROM pc ORDER BY adc_micros ASC, vec_id ASC LIMIT 10""".stripMargin
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
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           |           WHERE vec_id <> 0),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(idx)}),
           |lut(s, j, val) AS (VALUES
           |${lutValuesSql(lut)}),
           |${codesAdcSql(idx, "v")}""".stripMargin
      }
    ),

    // ---- OPQ: ADC top-k over rotation-optimized codes ----
    // The rotated tier at identical (nsub, ksub): the oracle re-derives
    // the ROTATION itself (per-dim double dot, left-to-right, one
    // float rounding — MatVec's exact arithmetic), then codes via the
    // streamed argmin and the ADC score through the rotated-query LUT.
    // Every stage of rotation → encode → score is bit-matched.
    QueryDef(
      "q_pq_adc_opq",
      s"OPQ ADC top-10 (nsub=$NSUB, ksub=$KSUB): learned rotation, then PQ codes",
      (s, dir) => {
        val (idx, path) = opqLayout(s, dir)
        val q = queryVec(s, dir)
        State.opq = Some((idx, Opq.adcLut(idx, q)))
        Opq.topKAdc(s, s.read.parquet(path), "vec_id", idx, q, k = 10,
          pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (idx, lut) = State.opq.getOrElse(throw new IllegalStateException(
          "OPQ state not recorded — run q_pq_adc_opq before rendering its oracle"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           |           WHERE vec_id <> 0),
           |v AS (SELECT vec_id, ${rotatedSql(idx.rotation, "e")} AS e FROM v0),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(idx.pq)}),
           |lut(s, j, val) AS (VALUES
           |${lutValuesSql(lut)}),
           |${codesAdcSql(idx.pq, "v")}""".stripMargin
      }
    ),

    // ---- OPQ composed into the partitioned tier: the production
    // shape of the learned rotation. Coarse cells AND codebooks live
    // in the rotated space; the read rotates its query driver-side
    // and then file pruning × byte shrinking compose unchanged. The
    // oracle re-derives the ROTATION of every corpus vector in SQL,
    // then the coarse argmin, the probe list (from the rotated
    // query), the codes, and the ADC scores — the full composed
    // approximate path, bit-for-bit.
    QueryDef(
      "q_ann_ivfpq_opq",
      "OPQ IVF-PQ top-10: learned rotation, probe 2/8 rotated-space cells, ADC",
      (s, dir) => {
        val (coarse, idx, path) = ivfPqOpqLayout(s, dir)
        val q = queryVec(s, dir)
        State.ivfpqOpq = Some((coarse.centroids, idx, Opq.adcLut(idx, q)))
        Opq.topKPartitionedOpq(s, path, "vec_id", coarse, idx, q, k = 10,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, idx, lut) = State.ivfpqOpq.getOrElse(throw new IllegalStateException(
          "OPQ IVF-PQ state not recorded — run q_ann_ivfpq_opq before rendering its oracle"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |vr AS (SELECT vec_id, ${rotatedSql(idx.rotation, "e")} AS e FROM v0),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM vr),
           |q AS (SELECT e AS qv FROM vr WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |v AS (SELECT a.vec_id, a.e, a.cell FROM a, p
           |      WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(idx.pq)}),
           |lut(s, j, val) AS (VALUES
           |${lutValuesSql(lut)}),
           |${codesAdcSql(idx.pq, "v", carry = Seq("cell"))}""".stripMargin
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
        // the 8-entry coarse argmin stays in per-row formula form
        // (proven scale-stable by q_ann_ivf_probe at 100x); only the
        // 256-entry code derivation needs the join form
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v0),
           |q AS (SELECT e AS qv FROM v0 WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |v AS (SELECT a.vec_id, a.e, a.cell FROM a, p
           |      WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(pq)}),
           |lut(s, j, val) AS (VALUES
           |${lutValuesSql(lut)}),
           |${codesAdcSql(pq, "v", carry = Seq("cell"))}""".stripMargin
      }
    ),

    // ---- incremental append into the compressed tier ----
    // Base-trained layout + appended codes (frozen coarse centroids
    // AND codebooks), probe-all ADC top-10: appended vectors must
    // surface with EXACT scores. Codes are deterministic in the
    // frozen indexes, so the oracle re-derives every corpus vector's
    // codes from the recorded base-trained codebooks — base and
    // appended rows indistinguishable by construction (PqAppendSpec
    // pins layout equality with a fresh publish; this gates it
    // against DuckDB end-to-end).
    QueryDef(
      "q_ann_ivfpq_incremental",
      "IVF-PQ ADC top-10 after appending the vec_id%5=0 batch's codes (probe-all)",
      (s, dir) => {
        val (coarse, pqi, path) = ivfPqIncrementalLayout(s, dir)
        val q = queryVec(s, dir)
        State.ivfpqInc = Some((coarse.centroids, pqi, Pq.adcLut(pqi, q)))
        Pq.topKPartitionedPq(s, path, "vec_id", coarse, pqi, q, k = 10,
          nprobe = coarse.nlist, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, pqi, lut) = State.ivfpqInc.getOrElse(throw new IllegalStateException(
          "incremental IVF-PQ state not recorded — run q_ann_ivfpq_incremental first"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v0),
           |v AS (SELECT vec_id, e, cell FROM a WHERE vec_id <> 0),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(pqi)}),
           |lut(s, j, val) AS (VALUES
           |${lutValuesSql(lut)}),
           |${codesAdcSql(pqi, "v", carry = Seq("cell"))}""".stripMargin
      }
    ),

    // ---- batch ADC kNN JOIN over the partitioned codes layout ----
    // Every query of a set answered in one job: per-query LUTs ride
    // the broadcast as COLUMNS (PqLut — bit-for-bit the driver LUT,
    // PqBatchSpec-pinned), scoring is element_at lookups over 8-byte
    // codes. nprobe = nlist makes it provably per-query full-corpus
    // ADC, so the oracle re-derives each vector's codes ONCE (shared
    // across queries — the same streamed argmin as q_pq_adc) and
    // scores them against each recorded per-query LUT, ranked per
    // query. The partial-probe and residual twins are pinned against
    // their per-query searches in PqBatchSpec.
    QueryDef(
      "q_ann_pq_topk_batch",
      s"batch ADC top-10 for queries vec_id<3 over the IVF-PQ layout (probe-all)",
      (s, dir) => {
        val (coarse, pq, path) = ivfPqLayout(s, dir)
        val emb = Tables(s, dir).embeddings
        val qs = emb.filter(col("vec_id") < 3)
        State.batch = Some((pq,
          qs.select(col("vec_id"), col("embedding")).collect().toSeq
            .map(r => r.getLong(0) -> Pq.adcLut(pq, r.getSeq[Float](1).toArray))
            .sortBy(_._1)))
        Pq.topKBatchAdc(s, path, qs, "vec_id", "embedding", "vec_id",
          coarse, pq, k = 10, nprobe = coarse.nlist,
          pairFilter = col("q_id") =!= col("vec_id"))
      },
      Oracle.deferred {
        val (pq, luts) = State.batch.getOrElse(throw new IllegalStateException(
          "batch ADC state not recorded — run q_ann_pq_topk_batch before its oracle"))
        val vdefs = pq.codebooks.indices
          .map(s => s"max(CASE WHEN s = $s THEN val END) AS v$s").mkString(", ")
        val sum = pq.codebooks.indices.map(s => s"v$s").mkString(" + ")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(pq)}),
           |lut(q_id, s, j, val) AS (VALUES
           |${lutValuesPerQuerySql(luts)}),
           |scored AS (SELECT src.vec_id, cb.s, cb.j,
           |        ${joinDistSql(pq.dsub, "src.e")} AS d
           |      FROM v src CROSS JOIN cb),
           |codes AS (SELECT vec_id, s,
           |        CAST(min([d, CAST(j AS DOUBLE)])[2] AS INT) AS code
           |      FROM scored GROUP BY vec_id, s),
           |vals AS (SELECT l.q_id, c.vec_id, c.s, l.val
           |      FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
           |      WHERE c.vec_id <> l.q_id),
           |pc AS (SELECT q_id, vec_id, $vdefs FROM vals GROUP BY q_id, vec_id),
           |sc AS (SELECT q_id, vec_id,
           |        CAST(floor(($sum) * 1e6) AS BIGINT) AS adc_micros FROM pc),
           |rk AS (SELECT q_id, vec_id, adc_micros, row_number() OVER (
           |        PARTITION BY q_id ORDER BY adc_micros ASC, vec_id ASC) AS r FROM sc)
           |SELECT CAST(q_id AS BIGINT) AS q_id, vec_id, adc_micros
           |FROM rk WHERE r <= 10 ORDER BY q_id, adc_micros, vec_id""".stripMargin
      }
    ),

    // ---- the production IVF-PQ read path: probe-pruned ADC
    // shortlist → exact cosine re-rank of only the shortlisted ids ----
    // The compressed tier recalls 30 candidates cheaply (2/8 of the
    // files listed, 8-byte codes read), and only those 30 raw vectors
    // are fetched (pushed literal IN filter) and scored exactly. The
    // oracle re-derives the whole composition: coarse argmin + probe
    // list + codes + ADC shortlist, then the exact cosine over the
    // shortlist — every approximate AND exact stage bit-matched.
    QueryDef(
      "q_ann_ivfpq_rerank",
      "IVF-PQ ADC shortlist (30 of 2/8 cells) re-ranked exactly by cosine, top-10",
      (s, dir) => {
        val (coarse, pq, path) = ivfPqLayout(s, dir)
        val q = queryVec(s, dir)
        State.rerank = Some((coarse.centroids, pq, Pq.adcLut(pq, q)))
        Pq.topKRerankPartitionedPq(s, path, Tables(s, dir).embeddings,
          "vec_id", "embedding", coarse, pq, q, k = 10, candidates = 30,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, pq, lut) = State.rerank.getOrElse(throw new IllegalStateException(
          "rerank state not recorded — run q_ann_ivfpq_rerank before its oracle"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v0),
           |q AS (SELECT e AS qv FROM v0 WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |v AS (SELECT a.vec_id, a.e, a.cell FROM a, p
           |      WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(pq)}),
           |lut(s, j, val) AS (VALUES
           |${lutValuesSql(lut)}),
           |${codesAdcCtes(pq, "v", carry = Seq("cell"), lutPerCell = false)},
           |sl AS (SELECT vec_id, CAST(floor((${adcSumSql(pq)}) * 1e6) AS BIGINT) AS adc_micros
           |      FROM pc ORDER BY adc_micros ASC, vec_id ASC LIMIT 30)
           |SELECT r.vec_id, round(list_dot_product(r.e, q.qv) /
           |  (sqrt(list_dot_product(r.e, r.e)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
           |FROM v0 r JOIN sl ON r.vec_id = sl.vec_id CROSS JOIN q
           |ORDER BY cos DESC, r.vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ---- residual IVF-PQ (IVFADC): codes of v - centroid(cell),
    // ONE shared codebook, per-probed-cell query LUTs ----
    // The recall refinement over q_ann_ivfpq at the same byte budget
    // (PqSpec pins the reconstruction-error inequality). The oracle
    // re-derives the residual IN FLOAT (matching the stored element
    // type's rounding), codes via the streamed join argmin, and the
    // score through the per-cell LUT join.
    QueryDef(
      "q_ann_ivfpq_residual",
      s"residual IVF-PQ top-10: probe 2/8 cells, shared residual codebook, per-cell LUTs",
      (s, dir) => {
        val (coarse, pq, path) = ivfPqResidualLayout(s, dir)
        val q = queryVec(s, dir)
        val probes = Ivf.probeOrder(coarse, q).take(2)
        State.ivfpqResidual = Some((coarse.centroids, pq,
          probes.map { c =>
            val cent = coarse.centroids(c)
            c -> Pq.adcLut(pq, Array.tabulate(q.length)(i => q(i) - cent(i)))
          }))
        Pq.topKPartitionedPqResidual(s, path, "vec_id", coarse, pq, q, k = 10,
          nprobe = 2, pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val (cents, pq, luts) = State.ivfpqResidual.getOrElse(throw new IllegalStateException(
          "residual IVF-PQ state not recorded — run q_ann_ivfpq_residual before its oracle"))
        s"""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${argminSql(cents, "e")} AS cell FROM v0),
           |q AS (SELECT e AS qv FROM v0 WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q),
           |cm AS (SELECT ${floatMatrixSql(cents)} AS m),
           |v AS (SELECT a.vec_id, a.cell,
           |        list_transform(range(1, ${pq.dim + 1}),
           |          i -> CAST(CAST(a.e[i] AS FLOAT) - cm.m[a.cell + 1][i] AS DOUBLE)) AS e
           |      FROM a, p, cm WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)),
           |cb(s, j, c2, entry) AS (VALUES
           |${codebookValuesSql(pq)}),
           |lut(cell, s, j, val) AS (VALUES
           |${lutValuesPerCellSql(luts)}),
           |${codesAdcSql(pq, "v", carry = Seq("cell"), lutPerCell = true)}""".stripMargin
      }
    )
  )
}

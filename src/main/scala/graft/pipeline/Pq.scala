package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NearestCell

/** Product quantization (PQ) — the compressed tier of the ANN story
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011). The vector is split into `nsub` subvectors;
  * each subvector is quantized to one of `ksub` codebook entries, so a
  * dim-64 float vector (256 B) becomes nsub codes (8 B at nsub=8,
  * ksub<=256) — a 32x compression that turns a 100 TB raw-vector
  * corpus into ~3 TB of codes that fit a far smaller cluster's page
  * cache. Search never decompresses: an ADC (asymmetric distance
  * computation) lookup table of `nsub x ksub` partial distances is
  * built once per query on the driver, and scoring a vector is nsub
  * array lookups + adds — no dot products at scan time.
  *
  * Scale shape, stage by stage:
  *  - TRAIN touches a driver-bounded deterministic sample (standard
  *    practice: codebooks of ksub<=256 entries need only
  *    O(100-1000 x ksub) training points, not the corpus — the same
  *    bounded-collect class as IVF centroid training);
  *  - ENCODE is one scan: nsub [[NearestCell]] expressions over sliced
  *    subvectors, all codegen'd, O(1) plan size in ksub;
  *  - ADC SEARCH is one scan of the codes table: the per-query LUT
  *    enters the plan as nsub small array literals, scoring stays
  *    inside whole-stage codegen, and the corpus read is 32x less I/O
  *    than raw vectors;
  *  - IVF-PQ composes both prunings ([[writePartitionedPq]]): the
  *    coarse quantizer prunes FILES (read nprobe/nlist of the
  *    directories), PQ shrinks BYTES (32x less data per file read).
  *    This non-residual composition keeps codes independent of the
  *    assigned cell; the residual variant (encode v - centroid, one
  *    codebook shared across cells) improves recall at the cost of
  *    cell-dependent codes and is the documented next refinement.
  *
  * Reference intent anchor: the reference packs property values into
  * fixed-width records so lookups touch a predictable number of bytes
  * (HGraphStorage FileOps.hs:153-169); PQ is that idea applied to
  * vectors — fixed-width codes with O(1) per-row scoring.
  */
object Pq {

  /** `codebooks(s)(j)` = entry j of subspace s (dsub floats each). */
  final case class PqIndex(codebooks: Array[Array[Array[Float]]]) {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
    def nsub: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def dsub: Int = codebooks(0)(0).length
    def dim: Int  = nsub * dsub
  }

  def register(spark: SparkSession): Unit = NearestCell.register(spark)

  /** Default training-sample size, scaled with the codebook: at least
    * [[minSampleRows]] and at least 64 points per centroid — a flat
    * 4096 at ksub = 256 is 16 points per centroid, well under the
    * ~39×k rule of thumb in the public FAISS training guidance, and
    * starves the larger codebooks the parameter exists for. Still a
    * driver-bounded collect: 64 × 256 × dim floats is single-digit MB.
    */
  private[pipeline] val minSampleRows: Int = 4096
  private[graft] def defaultSampleRows(ksub: Int): Int =
    math.max(minSampleRows, 64 * ksub)

  /** Per-subspace Lloyd over a DETERMINISTIC driver-bounded sample
    * (first `sampleRows` vectors in id order; sampleRows x dim floats
    * on the driver — the same KB-to-MB bounded-collect class as IVF
    * centroid training; the default scales with ksub,
    * [[defaultSampleRows]]). Init is the first ksub sample subvectors;
    * assignment is argmin (|c|^2 - 2 v.c) with ties to the lower code
    * ([[NearestCell]]'s exact rule); an emptied cluster keeps its
    * previous entry. ksub clamps to the sample size.
    */
  def train(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      nsub: Int, ksub: Int, iters: Int = 4, sampleRows: Int = -1): PqIndex = {
    val rows = if (sampleRows > 0) sampleRows else defaultSampleRows(ksub)
    val sample = emb.orderBy(col(idCol)).limit(rows)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    trainOn(sample, nsub, ksub, iters)
  }

  /** Driver-side half of [[train]] over an already-collected sample —
    * shared with [[Opq.train]], which re-trains codebooks on rotated
    * copies of the same sample inside its alternation loop.
    */
  private[pipeline] def trainOn(sample: Array[Array[Float]], nsub: Int, ksub: Int,
      iters: Int): PqIndex = {
    val dim = sample(0).length
    require(dim % nsub == 0, s"dim $dim not divisible by nsub $nsub")
    val dsub = dim / nsub
    val k = math.min(ksub, sample.length)
    PqIndex(Array.tabulate(nsub) { s =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)), k, iters)
    })
  }

  private def lloyd(xs: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val dsub = xs(0).length
    var cents = xs.take(k).map(_.clone)
    (1 to iters).foreach { _ =>
      val sums   = Array.fill(k, dsub)(0.0)
      val counts = new Array[Long](k)
      xs.foreach { x =>
        val c = nearest(cents, x)
        var d = 0; while (d < dsub) { sums(c)(d) += x(d).toDouble; d += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // emptied cluster keeps its entry
        else Array.tabulate(dsub)(d => (sums(c)(d) / counts(c)).toFloat)
      }
    }
    cents
  }

  /** argmin (|c|^2 - 2 x.c), ties to the lower index — [[NearestCell]]'s
    * exact arithmetic (c2 accumulated left-to-right, dot left-to-right
    * in doubles) so driver-side training and the distributed encode
    * agree bit-for-bit.
    */
  private[pipeline] def nearest(cents: Array[Array[Float]], x: Array[Float]): Int = {
    var best = Double.PositiveInfinity; var bestC = 0
    var c = 0
    while (c < cents.length) {
      var c2 = 0.0; var dot = 0.0; var d = 0
      while (d < cents(c).length) {
        c2  += cents(c)(d).toDouble * cents(c)(d).toDouble
        dot += cents(c)(d).toDouble * x(d).toDouble
        d += 1
      }
      val dist = c2 - 2.0 * dot
      if (dist < best) { best = dist; bestC = c }
      c += 1
    }
    bestC
  }

  /** Codes column: array of nsub codes, each the [[NearestCell]] argmin
    * of the corresponding subvector slice — nsub codegen'd expressions,
    * O(1) plan size in ksub. Stored as TINYINT (ksub <= 256 always
    * holds for byte-width PQ; parquet bit-packs the column).
    */
  def encode(vec: Column, index: PqIndex): Column = {
    require(index.ksub <= 256, s"byte-width codes need ksub <= 256, got ${index.ksub}")
    array(index.codebooks.zipWithIndex.map { case (cb, s) =>
      val c = NearestCell.col(slice(vec, s * index.dsub + 1, index.dsub), cb)
      // two's-complement store: codes 128..255 land as -128..-1 (a
      // plain cast("byte") is an ANSI overflow ERROR for them, and
      // pre-ANSI silently wrapped only by luck); readers recover the
      // unsigned value via codeAt's & 255
      (c - when(c > 127, 256).otherwise(0)).cast("byte")
    }.toIndexedSeq: _*)
  }

  /** Unsigned read of subspace `s`'s code: codes are stored as signed
    * TINYINT, so entries 128..255 come back negative — masking with
    * 255 before the 1-based literal lookup keeps ksub=256 (the
    * canonical byte-PQ width) correct instead of silently indexing
    * from the array end (PqSpec pins code 255 round-trip).
    */
  private def codeAt(codes: Column, s: Int): Column =
    element_at(codes, s + 1).cast("int").bitwiseAND(lit(255))

  /** Reconstruction: concatenation of the addressed codebook entries. */
  def decode(codes: Column, index: PqIndex): Column =
    flatten(array(index.codebooks.zipWithIndex.map { case (cb, s) =>
      element_at(graft.functions.Lits.floatMatrix(cb.map(_.toSeq).toSeq), codeAt(codes, s) + 1)
    }.toIndexedSeq: _*))

  /** Squared reconstruction error |v - decode(encode(v))|^2 — the
    * quantization-quality yardstick, summed left-to-right over dims.
    */
  def reconError(vec: Column, codes: Column, index: PqIndex): Column =
    aggregate(
      zip_with(vec, decode(codes, index),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, x) => a + x)

  /** ADC lookup table for `query`: lut(s)(j) = |c_j|^2 - 2 q_s.c_j
    * (the rank-equivalent core of |q_s - c_j|^2; the constant |q|^2 is
    * dropped). Driver-side over the KB-sized codebooks; same
    * accumulation order as [[NearestCell]] so a SQL oracle emitting
    * these arithmetic steps reproduces the doubles bit-for-bit.
    */
  def adcLut(index: PqIndex, query: Array[Float]): Array[Array[Double]] = {
    require(query.length == index.dim, s"query dim ${query.length} != index dim ${index.dim}")
    Array.tabulate(index.nsub) { s =>
      val off = s * index.dsub
      index.codebooks(s).map { c =>
        var c2 = 0.0; var dot = 0.0; var d = 0
        while (d < c.length) {
          c2  += c(d).toDouble * c(d).toDouble
          dot += c(d).toDouble * query(off + d).toDouble
          d += 1
        }
        c2 - 2.0 * dot
      }
    }
  }

  /** ADC score: nsub literal-array lookups + adds, left-to-right —
    * approximate squared distance (minus |q|^2) of the query to the
    * ENCODED vector, equal BY CONSTRUCTION to the exact score of its
    * reconstruction (PqSpec pins the identity). No vector arithmetic
    * at scan time; stays inside whole-stage codegen.
    */
  def adcScore(codes: Column, lut: Array[Array[Double]]): Column =
    lut.zipWithIndex.map { case (l, s) =>
      element_at(graft.functions.Lits.doubles(l.toSeq), codeAt(codes, s) + 1)
    }.reduceLeft(_ + _)

  /** Integer-micro ADC (floor(adc * 1e6)): floor of a bit-identical
    * double is engine-stable where decimal rounding half-up/half-even
    * is not — gate outputs and ordering use this form.
    */
  def adcMicros(codes: Column, lut: Array[Array[Double]]): Column =
    floor(adcScore(codes, lut) * lit(1e6)).cast("long")

  /** Publish the codes table: (id, codes) — the 32x-smaller scan
    * target for [[topKAdc]]. One encode scan; plain parquet.
    */
  def writeCodes(emb: DataFrame, idCol: String, vecCol: String,
      index: PqIndex, path: String): Unit = {
    register(emb.sparkSession)
    emb.select(col(idCol), encode(col(vecCol), index).as("codes"))
      .write.mode("overwrite").parquet(path)
  }

  /** ADC top-k over a codes table: one pruned scan (id + 8 bytes of
    * codes per row), LUT scoring, ascending top-k. Deterministic
    * ordering: (adc_micros, id).
    */
  def topKAdc(spark: SparkSession, codes: DataFrame, idCol: String,
      index: PqIndex, query: Array[Float], k: Int,
      pred: Column = lit(true)): DataFrame = {
    val lut = adcLut(index, query)
    codes.filter(pred)
      .select(col(idCol), adcMicros(col("codes"), lut).as("adc_micros"))
      .orderBy(col("adc_micros").asc, col(idCol).asc)
      .limit(k)
  }

  /** ADC shortlist + EXACT re-rank — the standard production shape:
    * PQ recalls a candidate set cheaply (compressed scan), then the
    * raw vectors of ONLY those candidates are fetched and scored
    * exactly (cosine). The candidate frame is k-row tiny, so the
    * fetch-back join broadcasts; the corpus raw vectors are read only
    * through that join's pushed id filter. With `candidates` >= corpus
    * size this is provably the brute-force cosine top-k (PqSpec).
    */
  def topKRerank(spark: SparkSession, codes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, index: PqIndex, query: Array[Float],
      k: Int, candidates: Int, pred: Column = lit(true)): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val cand = topKAdc(spark, codes, idCol, index, query, candidates, pred).select(idCol)
    corpus.join(broadcast(cand), idCol)
      .withColumn("cos", round(graft.functions.CosineSim.col(col(vecCol), graft.functions.Lits.floats(query.toSeq)), 6))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"))
  }

  // ---- IVF-PQ: coarse cells prune FILES, codes shrink BYTES ----

  // sidecar pattern as in Ivf.writePartitioned (graft.core.Sidecar —
  // Hadoop FileSystem API, any scheme): the layout must prove which
  // coarse centroids AND codebooks produced it before anything reads
  private def metaPath(path: String) = s"$path/_ivfpq_meta.properties"

  private[pipeline] def fingerprint(floats: Iterator[Float]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bb = java.nio.ByteBuffer.allocate(4)
    floats.foreach { f => bb.clear(); bb.putFloat(f); md.update(bb.array()) }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  private def coarsePrint(coarse: Ivf.IvfIndex) =
    fingerprint(coarse.centroids.iterator.flatten)
  private def pqPrint(index: PqIndex) =
    fingerprint(index.codebooks.iterator.flatten.flatten)

  /** Publish (id, codes) PARTITIONED BY coarse cell: a probe lists
    * only nprobe/nlist directories and reads 8-byte codes instead of
    * 256-byte vectors — both prunings compose in one layout. Raw
    * vectors are NOT stored here; re-ranking fetches them from the
    * primary corpus by id ([[topKRerank]]'s join shape).
    */
  def writePartitionedPq(emb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, path: String,
      extraMeta: Seq[(String, String)] = Nil): Unit = {
    register(emb.sparkSession)
    emb.select(col(idCol), encode(col(vecCol), index).as("codes"),
        Ivf.assign(col(vecCol), coarse).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    graft.core.Sidecar.writeProps(metaPath(path),
      Seq("coarse" -> coarsePrint(coarse), "pq" -> pqPrint(index),
        // publish-time quantization quality: the drift baseline
        // appended batches are judged against (one extra encode scan —
        // publish cost, like IVF's mean_dist)
        "mean_recon" -> meanReconError(emb, vecCol, index).toString) ++ extraMeta)
  }

  /** IVF-PQ search: probe-cell PARTITION filter (file pruning, exactly
    * [[Ivf.topKPartitioned]]'s mechanics) + ADC scoring over codes.
    * Refuses a layout whose sidecar does not match the passed indexes —
    * scoring with the wrong codebooks silently returns garbage.
    */
  def topKPartitionedPq(spark: SparkSession, path: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, query: Array[Float], k: Int,
      nprobe: Int, pred: Column = lit(true)): DataFrame =
    topKPartitionedPqChecked(spark, path, idCol, coarse, index, query, k,
      nprobe, pred, rot = None)

  /** [[topKPartitionedPq]] with an explicit rotation expectation —
    * `rot = Some(fp)` is [[Opq]]'s entry (the query is ALREADY rotated
    * and the layout must have been published with that rotation);
    * `rot = None` refuses OPQ layouts (scoring a rotated-space codes
    * table with an unrotated query's LUT is silent garbage, the exact
    * class the sidecar guard exists for).
    */
  private[pipeline] def topKPartitionedPqChecked(spark: SparkSession,
      path: String, idCol: String, coarse: Ivf.IvfIndex, index: PqIndex,
      query: Array[Float], k: Int, nprobe: Int, pred: Column,
      rot: Option[String]): DataFrame = {
    checkPqLayout(path, coarse, index, residual = false, rot = rot)
    val probeCells = Ivf.probeOrder(coarse, query).take(nprobe)
    val lut = adcLut(index, query)
    Tombstones.applyTo(
      spark.read.parquet(path).filter(col("cell").isin(probeCells: _*) && pred),
      path, idCol)
      .select(col(idCol), adcMicros(col("codes"), lut).as("adc_micros"), col("cell"))
      .orderBy(col("adc_micros").asc, col(idCol).asc)
      .limit(k)
  }

  private[pipeline] def checkPqLayout(path: String, coarse: Ivf.IvfIndex,
      index: PqIndex, residual: Boolean,
      rot: Option[String] = None): Map[String, String] = {
    val mp = metaPath(path)
    // bounded retry on missing: a republish-in-flight (delete→rename
    // on filesystems without atomic replace) must not surface as a
    // spurious "no sidecar" to a concurrent probe
    val meta = graft.core.Sidecar.readPropsExpected(mp).getOrElse(throw new IllegalArgumentException(
      s"no IVF-PQ metadata sidecar at $mp — publish with writePartitionedPq" +
        (if (residual) "Residual" else "")))
    require(meta.get("coarse").contains(coarsePrint(coarse)) &&
        meta.get("pq").contains(pqPrint(index)),
      s"IVF-PQ index mismatch at $path: layout published with " +
        s"(coarse=${meta.getOrElse("coarse", "?")}, pq=${meta.getOrElse("pq", "?")}) " +
        s"but the read uses (coarse=${coarsePrint(coarse)}, pq=${pqPrint(index)}) — " +
        "republish after retraining instead of mixing geometries")
    val isResidual = meta.get("residual").contains("true")
    require(isResidual == residual,
      s"IVF-PQ layout kind mismatch at $path: published residual=$isResidual but the read " +
        s"expects residual=$residual — raw-vector LUTs over residual codes (or the " +
        "reverse) score silent garbage; use the matching topKPartitionedPq variant")
    // rotation kind guard: OPQ layouts store codes of R·v, so every
    // read must present the SAME rotation (and rotate its query);
    // plain reads must refuse them — unrotated-query LUTs over
    // rotated-space codes score silent garbage, same class as the
    // residual mismatch above
    (rot, meta.get("rot")) match {
      case (None, Some(fp)) => throw new IllegalArgumentException(
        s"IVF-PQ layout at $path was published with an OPQ rotation (rot=$fp) — " +
          "read it through the Opq entry points, which rotate the query to match")
      case (Some(fp), stored) => require(stored.contains(fp),
        s"OPQ rotation mismatch at $path: layout published with " +
          s"rot=${stored.getOrElse("<none — plain PQ layout>")} but the read expects rot=$fp — " +
          "republish after re-learning the rotation instead of mixing geometries")
      case (None, None) => ()
    }
    meta
  }

  /** Batch ADC kNN JOIN — [[Ivf.topKBatch]]'s shape over the
    * compressed layout: top-k ADC neighbors for EVERY query of a set
    * in one job against a cell-partitioned CODES table. The two scale
    * levers compose per query: the corpus scan reads only the union
    * of probed cell directories, and inside them 8-byte codes instead
    * of raw vectors (32× at dim 64).
    *
    * The driver-literal LUT of [[topKAdc]] does not exist here — the
    * query set is DATA — so each query row computes its own
    * nsub×ksub LUT ONCE via [[graft.functions.PqLut]] (one plan node;
    * O(dim·ksub) flops per query row) and carries it through the
    * broadcast. Scoring each (corpus row, query) pair is then nsub
    * `element_at` lookups + adds, identical arithmetic to the
    * driver-LUT form (PqBatchSpec pins batch ≡ per-query [[topKAdc]]
    * at nprobe = nlist). The only shuffle ranks narrow
    * (q_id, id, adc_micros) triples — codes and LUTs never shuffle;
    * query sets above broadcast budget go through
    * [[topKBatchAdcSlabbed]]. Tombstoned ids are hidden.
    */
  def topKBatchAdc(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, k: Int, nprobe: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    checkPqLayout(path, coarse, index, residual = false)
    batchAdc(spark, path, queries, qIdCol, qVecCol, idCol, coarse, index,
      k, nprobe, pairFilter, residual = false)
  }

  /** [[topKBatchAdc]] over a RESIDUAL layout: the LUT is per
    * (query, probed cell) — built from the query's residual against
    * that cell's centroid — so it is computed on the exploded
    * (query × probe-cell) frame instead of once per query:
    * nprobe LUTs per query, still one [[graft.functions.PqLut]] node,
    * and the per-cell dispatch of [[topKPartitionedPqResidual]]'s
    * `when` chain disappears — each broadcast row already carries
    * exactly its cell's LUT.
    */
  def topKBatchAdcResidual(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, k: Int, nprobe: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    checkPqLayout(path, coarse, index, residual = true)
    batchAdc(spark, path, queries, qIdCol, qVecCol, idCol, coarse, index,
      k, nprobe, pairFilter, residual = true)
  }

  /** [[topKBatchAdc]] for query sets too large to broadcast whole —
    * the exact slab move of [[Ivf.topKBatchSlabbed]]: hash the query
    * ids into `slabs` groups, run one [[topKBatchAdc]] per slab, union
    * the results. Each slab keeps the single-batch plan (pruned codes
    * scan, broadcast LUT side, narrow-triple rank shuffle); the codes
    * are scanned once per slab but never shuffled. The broadcast
    * budget bites SOONEST on the residual variant — its LUT rows are
    * per (query, probed cell), nsub×ksub×8 B each (~16 KB at 8×256),
    * so a 50k-query set at nprobe=2 is ~1.6 GB of broadcast; size
    * `slabs` so (query rows / slabs) × nprobe × LUT bytes fits the
    * budget. Results are identical to the unsliced call for any slab
    * count (PqBatchSpec pins slabs=3 ≡ slabs=1 for both variants).
    */
  def topKBatchAdcSlabbed(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, k: Int, nprobe: Int, slabs: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    require(slabs >= 1, s"slabs must be >= 1, got $slabs")
    (0 until slabs).map { s =>
      topKBatchAdc(spark, path,
        queries.filter(pmod(hash(col(qIdCol)), lit(slabs)) === s),
        qIdCol, qVecCol, idCol, coarse, index, k, nprobe, pairFilter)
    }.reduce(_.unionAll(_))
  }

  /** [[topKBatchAdcResidual]] sliced into broadcastable slabs — see
    * [[topKBatchAdcSlabbed]] (the residual variant is where the
    * per-(query, cell) LUT broadcast outgrows the budget first).
    */
  def topKBatchAdcResidualSlabbed(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, k: Int, nprobe: Int, slabs: Int,
      pairFilter: Column = lit(true)): DataFrame = {
    require(slabs >= 1, s"slabs must be >= 1, got $slabs")
    (0 until slabs).map { s =>
      topKBatchAdcResidual(spark, path,
        queries.filter(pmod(hash(col(qIdCol)), lit(slabs)) === s),
        qIdCol, qVecCol, idCol, coarse, index, k, nprobe, pairFilter)
    }.reduce(_.unionAll(_))
  }

  private[pipeline] def batchAdc(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, k: Int, nprobe: Int,
      pairFilter: Column, residual: Boolean): DataFrame = {
    graft.functions.NearestCells.register(spark)
    graft.functions.PqLut.register(spark)
    val np = math.min(nprobe, coarse.nlist)
    val exploded = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"),
      explode(graft.functions.NearestCells.col(col(qVecCol), coarse.centroids, np)).as("cell"))
    val qcells =
      if (residual)
        // per-(query, cell) LUT over the residual q - centroid(cell)
        exploded.select(col("q_id"), col("cell"),
          graft.functions.PqLut.col(
            residualCol(col("q_vec"), col("cell"), coarse), index.codebooks).as("q_lut"))
      else
        exploded.select(col("q_id"), col("cell"),
          graft.functions.PqLut.col(col("q_vec"), index.codebooks).as("q_lut"))
    val wanted = qcells.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val corpus = Tombstones.applyTo(
      spark.read.parquet(path).filter(col("cell").isin(wanted: _*)), path, idCol)
    val score = (0 until index.nsub)
      .map(s => element_at(element_at(col("q_lut"), s + 1), codeAt(col("codes"), s) + 1))
      .reduceLeft(_ + _)
    val scored = corpus.join(broadcast(qcells), Seq("cell"))
      .filter(pairFilter)
      .select(col("q_id"), col(idCol),
        floor(score * lit(1e6)).cast("long").as("adc_micros"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adc_micros").asc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  // ---- residual IVF-PQ (IVFADC, Jégou TPAMI'11 §IV): encode
  // v - centroid(cell(v)) with ONE codebook shared across cells.
  // Residuals are centered near zero with far less spread than raw
  // vectors, so the same ksub budget quantizes them finer — better
  // recall at identical storage (8 bytes/row + the cell directory).
  // The price: ADC needs a PER-PROBED-CELL lookup table (the query's
  // residual differs per cell) — nprobe driver-side LUTs instead of 1.

  /** `v - centroid[cellCol]` elementwise, in FLOAT (matches the
    * stored element type; an engine re-deriving codes reproduces the
    * identical rounding with float casts, which a double-precision
    * residual here would break).
    */
  private def residualCol(vec: Column, cellCol: Column, coarse: Ivf.IvfIndex): Column = {
    val cents = graft.functions.Lits.floatMatrix(coarse.centroids.map(_.toSeq).toSeq)
    zip_with(vec, element_at(cents, cellCol + 1), (x, y) => x - y)
  }

  /** Train the shared residual codebook: [[train]] over
    * v - centroid(cell(v)) — same deterministic bounded sample, same
    * per-subspace Lloyd.
    */
  def trainResidual(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, nsub: Int, ksub: Int, iters: Int = 4,
      sampleRows: Int = -1): PqIndex = {
    NearestCell.register(spark)
    val cell = Ivf.assign(col(vecCol), coarse)
    train(spark,
      emb.select(col(idCol), residualCol(col(vecCol), cell, coarse).as("rv")),
      idCol, "rv", nsub, ksub, iters, sampleRows)
  }

  /** Publish (id, codes-of-residual) PARTITIONED BY coarse cell. The
    * sidecar records `residual=true` so the non-residual reader
    * refuses the layout (and vice versa) — scoring residual codes
    * with raw-vector LUTs is silent garbage, the same failure class
    * as a codebook mismatch.
    */
  def writePartitionedPqResidual(emb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, path: String): Unit = {
    register(emb.sparkSession)
    emb.withColumn("cell", Ivf.assign(col(vecCol), coarse))
      .select(col(idCol),
        encode(residualCol(col(vecCol), col("cell"), coarse), index).as("codes"),
        col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    graft.core.Sidecar.writeProps(metaPath(path),
      Seq("coarse" -> coarsePrint(coarse), "pq" -> pqPrint(index),
        "residual" -> "true",
        "mean_recon" -> meanReconError(emb, vecCol, index, Some(coarse)).toString))
  }

  // ---- incremental ingestion for the compressed tier: append a
  // batch's codes into the published cell directories with FROZEN
  // coarse centroids AND codebooks — O(batch) work, the PQ leg of the
  // same story as Ivf.appendPartitioned / the band-index append. The
  // drift signal here is QUANTIZATION quality: the batch's mean
  // squared reconstruction error against the publish-time baseline.
  // Stale codebooks show up as rising recon error (ADC scores degrade
  // smoothly, so nothing errors — this ratio is the retrain trigger).

  /** Drift report for PQ appends: how well the frozen codebooks
    * quantize the batch, relative to the corpus they were trained on.
    */
  final case class PqDrift(baseMeanRecon: Double, batchMeanRecon: Double) {
    def ratio: Double =
      if (baseMeanRecon > 0) batchMeanRecon / baseMeanRecon
      else if (batchMeanRecon > 0) Double.PositiveInfinity else 1.0
    def drifted(threshold: Double = 1.5): Boolean = ratio > threshold
  }

  private def driftOf(meta: Map[String, String], batchMean: Double): PqDrift =
    // layouts published before the baseline existed: judge against the
    // batch's own mean (ratio 1) — republish to get a real baseline
    PqDrift(meta.get("mean_recon").map(_.toDouble).getOrElse(batchMean), batchMean)

  /** Append a batch to a published IVF-PQ layout (geometry + kind
    * verified against the sidecar). Codes are deterministic in the
    * frozen indexes, so the appended layout is row-identical to a
    * fresh publish of base ∪ batch (PqAppendSpec pins search-result
    * equality). Returns the quantization-drift report.
    */
  def appendPartitionedPq(newEmb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, path: String,
      residual: Boolean = false): PqDrift =
    appendPartitionedPqChecked(newEmb, idCol, vecCol, coarse, index, path,
      residual, rot = None)

  /** [[appendPartitionedPq]] with an explicit rotation expectation —
    * [[Opq.appendPartitionedOpq]]'s entry (the batch is ALREADY
    * rotated); `rot = None` refuses OPQ layouts.
    */
  private[pipeline] def appendPartitionedPqChecked(newEmb: DataFrame,
      idCol: String, vecCol: String, coarse: Ivf.IvfIndex, index: PqIndex,
      path: String, residual: Boolean, rot: Option[String]): PqDrift = {
    val meta = checkPqLayout(path, coarse, index, residual, rot)
    encoded(newEmb, idCol, vecCol, coarse, index, residual)
      .write.mode("append").partitionBy("cell").parquet(path)
    driftOf(meta, meanReconError(newEmb, vecCol, index, if (residual) Some(coarse) else None))
  }

  /** Transactional half of [[appendPartitionedPq]]: stage the batch's
    * cell-partitioned code files invisibly; [[Ivf.promoteStaged]]
    * moves them live — the same marker-between protocol
    * [[graft.streaming.AnnStream]] builds exactly-once appends on.
    */
  def stagePartitionedPq(newEmb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, layoutPath: String,
      stagingPath: String, residual: Boolean = false): PqDrift = {
    val meta = checkPqLayout(layoutPath, coarse, index, residual)
    encoded(newEmb, idCol, vecCol, coarse, index, residual)
      .write.mode("overwrite").partitionBy("cell").parquet(stagingPath)
    driftOf(meta, meanReconError(newEmb, vecCol, index, if (residual) Some(coarse) else None))
  }

  private def encoded(emb: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, residual: Boolean): DataFrame = {
    register(emb.sparkSession)
    val withCell = emb.withColumn("cell", Ivf.assign(col(vecCol), coarse))
    val v = if (residual) residualCol(col(vecCol), col("cell"), coarse) else col(vecCol)
    withCell.select(col(idCol), encode(v, index).as("codes"), col("cell"))
  }

  /** Residual IVF-PQ search: probe-cell partition filter + ADC with a
    * PER-CELL LUT (query residual q - centroid_c per probed cell),
    * dispatched by a `when` chain over the ≤ nprobe probed cells —
    * plan size O(nprobe · nsub), still one codegen'd projection.
    */
  def topKPartitionedPqResidual(spark: SparkSession, path: String, idCol: String,
      coarse: Ivf.IvfIndex, index: PqIndex, query: Array[Float], k: Int,
      nprobe: Int, pred: Column = lit(true)): DataFrame = {
    checkPqLayout(path, coarse, index, residual = true)
    val probeCells = Ivf.probeOrder(coarse, query).take(nprobe)
    val luts = probeCells.map { c =>
      val cent = coarse.centroids(c)
      c -> adcLut(index, Array.tabulate(query.length)(i => query(i) - cent(i)))
    }
    val score = luts.tail
      .foldLeft(when(col("cell") === luts.head._1, adcScore(col("codes"), luts.head._2))) {
        case (acc, (c, l)) => acc.when(col("cell") === c, adcScore(col("codes"), l))
      }
    Tombstones.applyTo(
      spark.read.parquet(path).filter(col("cell").isin(probeCells: _*) && pred),
      path, idCol)
      .select(col(idCol),
        floor(score * lit(1e6)).cast("long").as("adc_micros"), col("cell"))
      .orderBy(col("adc_micros").asc, col(idCol).asc)
      .limit(k)
  }

  /** The production IVF-PQ read path composed end-to-end
    * ([[topKRerank]]'s shape over the PARTITIONED layout): a
    * probe-pruned ADC shortlist from the cell-partitioned codes
    * (tombstone-aware, nprobe/nlist of the files listed, 8-byte codes
    * read), then an EXACT cosine re-rank of only the shortlisted ids
    * against the primary raw-vector corpus. The shortlist is
    * `candidates`-bounded BY CONSTRUCTION (a top-k limit), so
    * collecting its ids is the same driver-tiny class as the
    * probe-cell union; they re-enter the plan as a literal IN filter,
    * which reaches the corpus scan as a pushed parquet filter — the
    * raw vectors of candidate rows are the ONLY raw vectors read
    * (row-group pruning; at 100 TB sort/bucket the corpus by id and
    * the fetch-back touches a handful of files). No join, no corpus
    * shuffle (PqSpec pins the pushed filter and the pruned shortlist
    * scan). With nprobe = nlist and `candidates` >= corpus size this
    * is provably the brute-force cosine top-k.
    *
    * Reference anchor: index lookup producing a small candidate set,
    * then exact per-candidate verification
    * (HGraphStorage perf/.../HackageTest.hs:167-178).
    */
  def topKRerankPartitionedPq(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String, coarse: Ivf.IvfIndex, index: PqIndex,
      query: Array[Float], k: Int, candidates: Int, nprobe: Int,
      pred: Column = lit(true), residual: Boolean = false): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val shortlist =
      if (residual)
        topKPartitionedPqResidual(spark, path, idCol, coarse, index, query,
          candidates, nprobe, pred)
      else
        topKPartitionedPq(spark, path, idCol, coarse, index, query,
          candidates, nprobe, pred)
    val ids = shortlist.select(col(idCol)).collect().map(_.get(0)).toSeq
    rerankFetch(corpus, idCol, vecCol, ids, query, k)
  }

  /** Exact-cosine fetch-back over a driver-bounded candidate id list —
    * the shared rerank tail of [[topKRerankPartitionedPq]] and
    * [[Opq.topKRerankPartitionedOpq]] (cosine is rotation-invariant,
    * so the OPQ path reranks RAW corpus vectors against the RAW
    * query even though its shortlist came from rotated-space ADC).
    * The ids push into the corpus scan as a literal IN filter: zero
    * shuffles, zero joins (PqSpec pins `PushedFilters: In`).
    */
  private[pipeline] def rerankFetch(corpus: DataFrame, idCol: String,
      vecCol: String, ids: Seq[Any], query: Array[Float], k: Int): DataFrame =
    corpus.filter(col(idCol).isin(ids: _*))
      .withColumn("cos", round(graft.functions.CosineSim.col(col(vecCol), graft.functions.Lits.floats(query.toSeq)), 6))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"))

  /** Batch form of [[topKRerankPartitionedPq]]: ADC shortlists for
    * EVERY query of a set ([[topKBatchAdc]] at k = `candidates`), then
    * one exact re-rank pass. The (q_id, id) shortlist pairs are
    * query-set × candidates rows of two longs — broadcast-sized by
    * construction — so the corpus raw vectors flow through a broadcast
    * join (scanned once, never shuffled), the query vectors re-attach
    * through a second broadcast, and the only shuffle ranks narrow
    * (q_id, id, cos) triples. Output: (q_id, idCol, cos).
    */
  def topKBatchAdcRerank(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String, idCol: String,
      vecCol: String, coarse: Ivf.IvfIndex, index: PqIndex, k: Int,
      candidates: Int, nprobe: Int, pairFilter: Column = lit(true)): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val sl = topKBatchAdc(spark, path, queries, qIdCol, qVecCol, idCol,
      coarse, index, candidates, nprobe, pairFilter)
      .select(col("q_id"), col(idCol))
    val qvecs = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    val scored = corpus.join(broadcast(sl), Seq(idCol))
      .join(broadcast(qvecs), Seq("q_id"))
      .select(col("q_id"), col(idCol),
        round(graft.functions.CosineSim.col(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Chosen knobs for the compressed read path, with the recall that
    * was MEASURED (never assumed) when they were chosen.
    */
  final case class AdcTuning(nprobe: Int, candidates: Int, recall: Double)

  /** Recall-driven tuning for the compressed tier — the
    * [[Ivf.nprobeForRecall]] analog for ADC + exact re-rank: find
    * (nprobe, candidates) such that [[topKBatchAdcRerank]]'s MEAN
    * recall@k over a sample query set meets `targetRecall`, measured
    * against exact brute-force cosine ground truth. The search prefers
    * small nprobe (file pruning is the bigger cost lever at scale)
    * and, within an nprobe, small candidate counts; candidates double
    * from k up to `maxCandidates`. The exact leg is computed once and
    * persisted; every trial is one pruned codes scan + one candidate
    * fetch-back. Runs on a SAMPLE query set, once per layout — a
    * tuning job, not a per-query cost.
    */
  def tuneAdcRerank(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String, idCol: String,
      vecCol: String, coarse: Ivf.IvfIndex, index: PqIndex, k: Int,
      targetRecall: Double, maxCandidates: Int = 1 << 12,
      pairFilter: Column = lit(true)): AdcTuning =
    tuneShortlistRerank(spark, corpus, queries, qIdCol, qVecCol, idCol, vecCol,
      k, targetRecall, maxCandidates, pairFilter, coarse.nlist) { (np, cand) =>
      topKBatchAdcRerank(spark, path, corpus, queries, qIdCol, qVecCol, idCol,
        vecCol, coarse, index, k, cand, np, pairFilter)
    }

  /** The grid harness of [[tuneAdcRerank]], parameterized over the
    * approximate read path so every shortlist+rerank tier (PQ ADC,
    * [[Sq]] — which delegates here) tunes identically: exact leg
    * computed once, nprobe doubling outer / candidates doubling
    * inner, first (np, cand) meeting `targetRecall` wins, best
    * measured returned when the cap is reached.
    */
  private[pipeline] def tuneShortlistRerank(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String, idCol: String,
      vecCol: String, k: Int, targetRecall: Double, maxCandidates: Int,
      pairFilter: Column, maxNprobe: Int)(
      approx: (Int, Int) => DataFrame): AdcTuning = {
    graft.functions.CosineSim.register(spark)
    val qvecs = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    // exact ground truth: brute-force cosine top-k per sample query —
    // the corpus scans once with the sample broadcast onto it, and the
    // only shuffle ranks narrow triples (the nprobe-free twin of
    // [[Ivf.topKBatch]])
    val exactScored = corpus.crossJoin(broadcast(qvecs))
      .filter(pairFilter)
      .select(col("q_id"), col(idCol),
        round(graft.functions.CosineSim.col(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol).asc)
    val exact = exactScored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).drop("rk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (queries.isEmpty) return AdcTuning(1, k, 1.0) // vacuous: nothing to tune
      require(!exact.isEmpty,
        "tuneShortlistRerank: the exact ground-truth leg is empty for a non-empty " +
          "query sample — nothing to measure recall against")
      def mean(np: Int, cand: Int): Double =
        Ivf.recallOf(exact, approx(np, cand), idCol)
          .agg(avg(col("recall"))).head().getDouble(0)
      val cands = Iterator.iterate(math.max(k, 1))(_ * 2)
        .takeWhile(_ < maxCandidates).toSeq :+ maxCandidates
      var best = AdcTuning(0, 0, -1.0)
      var np = 1
      while (np <= maxNprobe) {
        for (cand <- cands) {
          val r = mean(np, cand)
          if (r > best.recall) best = AdcTuning(np, cand, r)
          if (r >= targetRecall) return AdcTuning(np, cand, r)
        }
        if (np == maxNprobe) return best // cap reached: best measured
        np = math.min(np * 2, maxNprobe)
      }
      best
    } finally exact.unpersist()
  }

  /** Mean squared reconstruction error of a (possibly residual)
    * encoding over `emb` — the quantization-quality yardstick PqSpec
    * uses to pin that residual coding refines plain coding on the
    * same corpus at the same byte budget.
    */
  def meanReconError(emb: DataFrame, vecCol: String, index: PqIndex,
      coarse: Option[Ivf.IvfIndex] = None): Double = {
    register(emb.sparkSession)
    val v = coarse match {
      case Some(cq) => residualCol(col(vecCol), Ivf.assign(col(vecCol), cq), cq)
      case None     => col(vecCol)
    }
    // alias barrier: inlining decode(encode(v)) duplicates the encode
    // tree (with its nsub·ksub·dsub codebook literals) into each of
    // decode's nsub lookups — same dim^2 blowup [[Sq.meanReconError]]
    // hit at dim 64; the projection split keeps the tree linear
    emb.select(v.as("v"))
      .select(col("v"), encode(col("v"), index).as("codes"))
      .select(reconError(col("v"), col("codes"), index).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
  }
}

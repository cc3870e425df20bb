package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.Sidecar
import graft.pipeline.Dedup

/** Streaming near-duplicate ingestion: micro-batches of documents
  * flow into a published dedup store — the streaming leg of
  * [[Dedup.nearDuplicatesIncremental]], and the text twin of
  * [[AnnStream]]'s embedding ingestion. The store is three parquet
  * tables under one root:
  *
  *  - `docs`   — (id, text) of every ingested document;
  *  - `bands`  — the standing [[Dedup.bandTable]] (the published LSH
  *    index new batches join against — O(batch) banding, the corpus
  *    is never re-shingled);
  *  - `pairs`  — every verified near-dup pair mined so far, each
  *    emitted EXACTLY ONCE, in the batch where its LATER endpoint
  *    arrived (base-base pairs at publish; batch-batch and
  *    batch-corpus pairs per batch).
  *
  * That once-per-pair discipline gives the store its defining
  * invariant, spec-pinned end-to-end: after streaming any split of a
  * corpus in any batch order, `pairs` equals the one-shot
  * [[Dedup.nearDuplicates]] mine of the whole corpus — so a
  * downstream keep/drop (cluster + canonical) over the streamed store
  * decides exactly as it would over a batch re-mine, at O(batch)
  * incremental cost. At 100 TB the per-batch work is the incremental
  * miner's: band the batch, join the standing band index
  * (bucket-bounded), verify candidates only.
  *
  * Appends commit under [[StagedCommit]]'s staged-marker exactly-once
  * protocol — all three tables stage together and promote together,
  * so a killed writer can never publish a batch's docs without its
  * bands (which would silently lose every future pair against those
  * docs) or its pairs twice. The banding geometry (threshold, hash
  * count, bands, shingle width) is pinned in a sidecar at publish and
  * verified on every append: a batch banded with different parameters
  * joins the standing index to silent garbage — the same guard class
  * as the ANN layout fingerprints.
  *
  * Reference anchor: the reference's write path maintains its indexes
  * transactionally with the data they cover (Index.hs:70-84 trie
  * insert/insertNew during object writes); the band index here is
  * that index-with-the-data discipline for streaming text dedup.
  */
object DedupStream {

  /** LSH/verification geometry, fixed at publish. */
  final case class Params(threshold: Double, numHashes: Int = 16,
      bands: Int = 4, shingleN: Int = 3)

  def docsPath(root: String): String  = s"$root/docs"
  def bandsPath(root: String): String = s"$root/bands"
  def pairsPath(root: String): String = s"$root/pairs"
  private def metaPath(root: String)    = s"$root/_dedup_meta.properties"
  private def markerDir(root: String)   = s"$root/_dedup_applied"
  private def stagingDir(root: String)  = s"$root/_dedup_staging"

  /** Publish the store from a base corpus: docs + band index + the
    * base's own self-mine, plus the geometry sidecar every append is
    * checked against.
    */
  def publish(docs: DataFrame, idCol: String, text: Column, params: Params,
      root: String): Unit = {
    val d = docs.select(col(idCol).as("id"), text.as("text"))
    d.write.mode("overwrite").parquet(docsPath(root))
    Dedup.bandTable(d, "id", col("text"), params.numHashes, params.bands, params.shingleN)
      .write.mode("overwrite").parquet(bandsPath(root))
    Dedup.nearDuplicates(d, "id", col("text"), params.threshold,
        params.numHashes, params.bands, params.shingleN)
      .write.mode("overwrite").parquet(pairsPath(root))
    Sidecar.writeProps(metaPath(root), Seq(
      "kind" -> "dedup",
      "threshold" -> params.threshold.toString,
      "num_hashes" -> params.numHashes.toString,
      "bands" -> params.bands.toString,
      "shingle_n" -> params.shingleN.toString))
  }

  /** [[publish]] as the next version of a [[graft.core.Versions]]
    * root. Geometry changes (threshold, hashes, bands, shingles)
    * REQUIRE a republish — the sidecar guard refuses mixed-geometry
    * appends — and versioning makes that republish atomic under live
    * readers: queries that resolved the old version keep a complete
    * store; a stream is re-pointed by resolving `currentPath` on its
    * next (re)start. Returns the new live version.
    */
  def publishVersioned(docs: DataFrame, idCol: String, text: Column,
      params: Params, versionedRoot: String): Long =
    graft.core.Versions.publish(versionedRoot)(dir =>
      publish(docs, idCol, text, params, dir))

  private def checkStore(root: String, params: Params): Unit = {
    val meta = Sidecar.readPropsExpected(metaPath(root)).getOrElse(
      throw new IllegalArgumentException(
        s"no dedup store sidecar at ${metaPath(root)} — publish the base corpus first"))
    val want = Map("threshold" -> params.threshold.toString,
      "num_hashes" -> params.numHashes.toString, "bands" -> params.bands.toString,
      "shingle_n" -> params.shingleN.toString)
    val got = want.keys.map(k => k -> meta.getOrElse(k, "?")).toMap
    require(got == want,
      s"dedup store geometry mismatch at $root: published with $got but the append uses " +
        s"$want — a batch banded with different parameters joins the standing index to " +
        "silent garbage; republish instead of mixing geometries")
  }

  /** The staging half of one batch (exposed for the crash-window
    * spec): mine the batch's pairs against the CURRENT store, then
    * write pairs + the batch's bands + its docs under `staging`.
    * Deterministic in (store state, batch), so a pre-marker crash
    * restages identically. Returns the number of new pairs.
    */
  private[graft] def stageBatch(spark: SparkSession, batch: DataFrame,
      staging: String, root: String, params: Params): Long = {
    val b = batch.select(col("id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val corpus = spark.read.parquet(docsPath(root))
      val corpusBands = spark.read.parquet(bandsPath(root))
      val pairs = Dedup.nearDuplicatesIncremental(corpus, corpusBands, b,
        "id", col("text"), params.threshold, params.numHashes, params.bands,
        params.shingleN)
      pairs.write.mode("overwrite").parquet(s"$staging/pairs")
      Dedup.bandTable(b, "id", col("text"), params.numHashes, params.bands, params.shingleN)
        .write.mode("overwrite").parquet(s"$staging/bands")
      b.write.mode("overwrite").parquet(s"$staging/docs")
      spark.read.parquet(s"$staging/pairs").count()
    } finally { b.unpersist(blocking = false): Unit }
  }

  /** One micro-batch: geometry check, then mine + stage + marker +
    * promote under the exactly-once protocol. Returns the number of
    * newly mined pairs, or None for a replay. Batch ids must be fresh
    * (enforced by the incremental miner's disjointness check — a
    * reingested id is an ERROR, not a silent wrong answer).
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, checkpointDir: String,
      batchId: Long, idCol: String, text: Column, params: Params,
      root: String): Option[Long] = {
    checkStore(root, params)
    val b = batch.select(col(idCol).as("id"), text.as("text"))
    StagedCommit.run(markerDir(root), stagingDir(root), root, checkpointDir, batchId) {
      staging => stageBatch(spark, b, staging, root, params)
    }
  }

  /** Watch `srcDir` for document parquet files and ingest each
    * micro-batch into the store at `root` (published by [[publish]]
    * with the same `params` — the sidecar guard applies). `schema` is
    * the stream's EXPLICIT schema (must include `idCol` and
    * `textCol`); `checkpointDir` anchors source tracking AND the
    * append markers. `maxFilesPerTrigger` bounds batch size (and lets
    * tests force multi-batch runs).
    */
  def ingestDocuments(spark: SparkSession, srcDir: String, schema: StructType,
      idCol: String, textCol: String, params: Params, root: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int] = None,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    val rd = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(srcDir)
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, batch, checkpointDir, batchId, idCol, col(textCol),
          params, root)
          .foreach(onBatch(batchId, _))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

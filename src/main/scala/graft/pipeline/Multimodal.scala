package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque BINARY plus typed metadata.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub — but the Spark-side plumbing is
  * real: binary column, metadata struct at scan speed, batched
  * per-partition feature extraction with a fixed output schema (the
  * Scala analog of a pandas-batch UDF), partition-count preserved.
  * Swap `decodeStub` for a codec call and nothing else changes.
  */
object Multimodal {

  /** Metadata over any binary payload — pure expressions. */
  def mediaMeta(bin: Column, chunkBytes: Int = 1024): Seq[(String, Column)] = Seq(
    "byte_len" -> length(bin).cast("long"),
    "n_chunks" -> ceil(length(bin).cast("double") / chunkBytes).cast("long"),
    "header_hex" -> substring(lower(hex(bin)), 1, 16))

  /** Frame sampling over an opaque payload: treat the binary as
    * fixed-size frames and keep every `every`-th one, identified by a
    * fingerprint of its bytes. Pure expressions (binary substring +
    * hex), zero shuffles — the video/audio "sample k frames per clip"
    * pass at scan speed; a codec-aware variant swaps the fixed-size
    * slicing for container-format frame boundaries inside the same
    * plumbing.
    */
  def sampleFrames(df: DataFrame, idCol: String, bin: Column,
      frameBytes: Int = 64, every: Int = 4): DataFrame = {
    val nf = ceil(length(bin).cast("double") / frameBytes).cast("long")
    // the payload is hexed ONCE before the explode (2 chars per
    // byte): DuckDB can neither md5 a BLOB nor substring one, so
    // both engines hash the same lowercase hex slice — and hexing
    // after the explode would redo the full payload per frame
    df.select(col(idCol), lower(hex(bin)).as("__h"), nf.as("__nf"))
      .filter(col("__nf") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("__nf") - 1, lit(every.toLong))).as("frame_idx"),
        col("__h"))
      .select(col(idCol), col("frame_idx"),
        md5(expr(s"substring(__h, " +
          s"CAST(frame_idx * ${frameBytes * 2} + 1 AS INT), ${frameBytes * 2})"))
          .as("frame_md5"))
  }

  /** Resize over an opaque payload: uniform subsampling of the byte
    * stream to exactly `outBytes` samples (index i reads byte
    * `floor(i·len/outBytes)` — the nearest-neighbor downscale
    * schedule every image/audio resampler starts from), fingerprinted.
    * Pure expressions over ONE hex pass, zero shuffles; a codec-aware
    * variant swaps byte positions for pixel/sample positions inside
    * the same plumbing. Payloads shorter than `outBytes` keep their
    * natural length (no upsampling — the floor schedule would
    * duplicate bytes, which a stub should not invent).
    */
  def resize(df: DataFrame, idCol: String, bin: Column, outBytes: Int = 32): DataFrame = {
    require(outBytes > 0, s"outBytes must be positive: $outBytes")
    val len = length(bin).cast("long")
    df.select(col(idCol), lower(hex(bin)).as("__h"), len.as("__len"))
      .filter(col("__len") > 0)
      .select(col(idCol), col("__len"),
        least(col("__len"), lit(outBytes.toLong)).as("__out"), col("__h"))
      .select(col(idCol), col("__len").as("byte_len"), col("__out").as("out_bytes"),
        md5(concat_ws("", expr(
          s"transform(sequence(0L, __out - 1), i -> " +
            s"substring(__h, CAST((i * __len DIV __out) * 2 + 1 AS INT), 2))")))
          .as("resized_md5"))
  }

  final case class MediaFeature(id: Long, byteLen: Long, f0: Double, f1: Double, f2: Double)

  /** STUB decode: a real implementation would decode the codec frame
    * here (JPEG/PCM/...). Deterministic fake features derived from
    * the raw bytes keep the pipeline testable end-to-end.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    val len = bytes.length.toLong
    val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val last  = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
    MediaFeature(id, len, (len % 251).toDouble / 250.0, first / 255.0, last / 255.0)
  }

  /** Batched feature extraction: one decoder instance per partition,
    * rows streamed through it — the shape a GPU/codec batch UDF needs
    * (init cost amortized per partition, not per row).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      idCol: String, binCol: String): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}

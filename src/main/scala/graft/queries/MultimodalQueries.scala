package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal
import graft.sources.Tables

/** Multimodal-column plumbing driven over a synthesized binary
  * payload (documents' text bytes — the container ships no codecs;
  * see [[graft.pipeline.Multimodal]] for the stub boundary).
  */
object MultimodalQueries extends QueryModule {

  override def queries: Seq[QueryDef] = Seq(
    // ---- metadata over a binary column, scan-speed ----
    QueryDef(
      "q_multimodal_meta",
      "binary payload metadata: byte length, chunk count, header hex",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val bin  = encode(col("text"), "UTF-8")
        val meta = Multimodal.mediaMeta(bin).map { case (n, c) => c.as(n) }
        docs.select(col("doc_id") +: meta: _*)
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS byte_len,
             |  CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT) AS n_chunks,
             |  substr(lower(hex(encode(text))), 1, 16) AS header_hex
             |FROM documents""".stripMargin)
    ),

    // ---- frame sampling over the payload (every 4th 64-byte frame) ----
    QueryDef(
      "q_multimodal_frames",
      "fixed-size frame sampling: every 4th 64-byte frame fingerprinted",
      (s, dir) => {
        val docs = Tables(s, dir).documents
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        Multimodal.sampleFrames(docs, "doc_id", col("payload"))
      },
      Some("""WITH f AS (SELECT doc_id, encode(text) AS b,
             |      CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS nf
             |      FROM documents),
             |x AS (SELECT doc_id, b, unnest(range(0, nf, 4)) AS frame_idx FROM f WHERE nf > 0)
             |SELECT doc_id, frame_idx,
             |  md5(lower(substring(hex(b), CAST(frame_idx * 128 + 1 AS BIGINT), 128))) AS frame_md5
             |FROM x""".stripMargin)
    ),

    // ---- resize: uniform byte-stream subsampling (decode stub) ----
    // The nearest-neighbor downscale schedule over the opaque payload
    // (index i reads byte floor(i·len/out)): the missing verb between
    // frame-sampling and feature extraction. One hex pass, zero
    // shuffles; a codec-aware variant swaps byte positions for
    // pixel/sample positions in the same plumbing.
    QueryDef(
      "q_multimodal_resize",
      "resize payloads to 32 uniform byte samples, fingerprinted",
      (s, dir) => {
        val docs = Tables(s, dir).documents
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        Multimodal.resize(docs, "doc_id", col("payload"), outBytes = 32)
      },
      Some("""WITH f AS (SELECT doc_id, lower(hex(encode(text))) AS h,
             |        CAST(octet_length(encode(text)) AS BIGINT) AS len FROM documents),
             |g AS (SELECT doc_id, len, least(len, 32) AS outb, h FROM f WHERE len > 0)
             |SELECT doc_id, len AS byte_len, outb AS out_bytes,
             |  md5(array_to_string(list_transform(range(0, outb),
             |    i -> substring(h, CAST(((i * len) // outb) * 2 + 1 AS BIGINT), 2)), '')) AS resized_md5
             |FROM g""".stripMargin)
    ),

    // ---- batched per-partition feature extraction (decode stub) ----
    QueryDef(
      "q_multimodal_features",
      "per-partition batched decode (stub) -> fixed feature schema",
      (s, dir) => {
        val docs = Tables(s, dir).documents
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        Multimodal.extractFeatures(s, docs, "doc_id", "payload").toDF()
          .select(col("id").as("doc_id"), col("byteLen").as("byte_len"),
            round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"),
            round(col("f2"), 6).as("f2"))
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |  round((octet_length(encode(text)) % 251) / 250.0, 6) AS f0,
             |  round(ascii(substr(text, 1, 1)) / 255.0, 6) AS f1,
             |  round(ascii(substr(text, -1, 1)) / 255.0, 6) AS f2
             |FROM documents""".stripMargin)
    )
  )
}

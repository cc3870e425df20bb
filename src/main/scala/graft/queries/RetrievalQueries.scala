package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.{Retrieval, Similarity}
import graft.sources.Tables

/** Driver-verified gates for the sparse-retrieval surface: BM25
  * scoring and hybrid (BM25 + dense cosine) reciprocal-rank fusion.
  *
  * Oracle discipline: every double constant is emitted as
  * `'<Double.toString>'::DOUBLE` (DuckDB parses bare decimals as
  * DECIMAL; the string form round-trips the exact Scala double), the
  * per-document term fold is ordered on both engines (lexicographic
  * by token, left-to-right adds), and every rank is computed over the
  * ROUNDED score so ordering never depends on bit-identical `ln`.
  */
object RetrievalQueries extends QueryModule {

  private def d(x: Double): String = s"'$x'::DOUBLE"

  /** The fixed gate query: three terms with distinct document
    * frequencies in the synthetic corpus.
    */
  private val terms = Seq("spark", "join", "window")
  private def termsSql = terms.map(t => s"'$t'").mkString(", ")

  /** BM25 score CTEs over `documents` for [[terms]] — shared by the
    * BM25 gate and the hybrid gate. Mirrors [[Retrieval.bm25]]
    * arithmetic term-for-term.
    */
  private def bm25Ctes: String = bm25CtesOver("documents")

  /** Same CTEs over an arbitrary corpus relation — the takedown gate
    * scores the tombstoned index against the corpus minus the
    * deleted docs.
    */
  private def bm25CtesOver(corpus: String): String =
    s"""p AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |             unnest(string_split(text, ' ')) AS token FROM $corpus),
       |tp AS (SELECT doc_id, token, max(dl) AS dl, count(*) AS tf FROM p
       |       WHERE token IN ($termsSql) GROUP BY doc_id, token),
       |stats AS (SELECT count(*) AS n,
       |                 CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avgdl
       |          FROM $corpus),
       |dfr AS (SELECT token, count(*) AS df FROM tp GROUP BY token),
       |c AS (SELECT doc_id, tp.token AS token,
       |        ln(${d(1.0)} + (n - df + ${d(0.5)}) / (df + ${d(0.5)}))
       |          * (tf * ${d(Retrieval.K1 + 1.0)})
       |          / (tf + ${d(Retrieval.K1)} * (${d(1.0 - Retrieval.B)} + ${d(Retrieval.B)} * dl / avgdl)) AS contrib
       |      FROM tp JOIN dfr USING (token), stats),
       |s AS (SELECT doc_id,
       |        list_reduce(list_prepend(${d(0.0)}, list(contrib ORDER BY token)),
       |                    (a, x) -> a + x) AS score
       |      FROM c GROUP BY doc_id),
       |bm AS (SELECT doc_id, round(score, 6) AS bm25,
       |              row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rnk
       |       FROM s)""".stripMargin

  /** Dense leg: rank over rounded cosine vs vec 0 (same arithmetic as
    * the q_ann_bruteforce oracle), vec 0 excluded.
    */
  private def cosCte: String =
    """qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      |cs AS (SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
      |         (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
      |          sqrt(list_dot_product(qv, qv))), 6) AS cos
      |       FROM embeddings, qv WHERE vec_id <> 0),
      |cr AS (SELECT vec_id, cos, row_number() OVER (ORDER BY cos DESC, vec_id) AS rnk
      |       FROM cs)""".stripMargin

  override def queries: Seq[QueryDef] = Seq(

    // ---- BM25 ranked retrieval ----
    QueryDef(
      "q_text_bm25",
      "BM25 top-10 documents for a 3-term query (k1=1.2, b=0.75)",
      (s, dir) =>
        Retrieval.bm25TopK(Tables(s, dir).documents, "doc_id", col("text"), terms, 10),
      Some(s"""WITH $bm25Ctes
              |SELECT doc_id, bm25, CAST(rnk AS BIGINT) AS rnk
              |FROM bm WHERE rnk <= 10""".stripMargin)
    ),

    // ---- BM25 over the published inverted-index layout ----
    // Same oracle as q_text_bm25: the indexed path must score
    // bit-identically to the one-shot path while reading ONLY the
    // query terms' bucket directories (pruning pinned by
    // LexIndexSpec). Publish is ingest cost, paid once per session.
    QueryDef(
      "q_text_bm25_indexed",
      "BM25 top-10 via the token-bucket-partitioned inverted index",
      (s, dir) => {
        val path = SessionPublish.once(s, s"lexindex|$dir") {
          val p = SessionPublish.tempDir("graft-lexindex")
          Retrieval.publishIndex(Tables(s, dir).documents, "doc_id", col("text"),
            p, buckets = 16)
          p
        }
        Retrieval.searchIndex(s, path, terms, 10)
          .select(col("id").as("doc_id"), col("bm25"), col("rnk"))
      },
      Some(s"""WITH $bm25Ctes
              |SELECT doc_id, bm25, CAST(rnk AS BIGINT) AS rnk
              |FROM bm WHERE rnk <= 10""".stripMargin)
    ),

    // ---- exact phrase search, scan-speed one-shot ----
    // Count starts where the next 3 tokens equal the phrase; the
    // within-doc repeats at sf0.01 make n_occ > n_docs, so the
    // occurrence count is genuinely exercised.
    QueryDef(
      "q_text_phrase",
      "exact-phrase match: docs containing \"slow hash batch\", occurrences + first position",
      (s, dir) =>
        Retrieval.phraseMatch(Tables(s, dir).documents, "doc_id", col("text"),
          Seq("slow", "hash", "batch")),
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |m AS (SELECT doc_id,
             |        list_filter(generate_series(1, greatest(len(ts) - 2, 0)),
             |          i -> array_to_string(ts[i:i+2], ' ') = 'slow hash batch') AS ss
             |      FROM tok)
             |SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_occ,
             |       CAST(ss[1] - 1 AS BIGINT) AS first_pos
             |FROM m WHERE len(ss) > 0""".stripMargin)
    ),

    // ---- phrase search over the POSITIONAL published index ----
    // The postings now carry per-(doc, term) position lists, so a
    // phrase query intersects postings of its terms' (pruned) buckets
    // — documents are never re-read. Same oracle as q_text_phrase:
    // the indexed path must match the scan path exactly.
    QueryDef(
      "q_text_phrase_indexed",
      "exact-phrase match via positional postings in the token-bucket index",
      (s, dir) => {
        val path = SessionPublish.once(s, s"lexindex|$dir") {
          val p = SessionPublish.tempDir("graft-lexindex")
          Retrieval.publishIndex(Tables(s, dir).documents, "doc_id", col("text"),
            p, buckets = 16)
          p
        }
        Retrieval.phraseSearchIndex(s, path, Seq("slow", "hash", "batch"))
          .select(col("id").as("doc_id"), col("n_occ"), col("first_pos"))
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |m AS (SELECT doc_id,
             |        list_filter(generate_series(1, greatest(len(ts) - 2, 0)),
             |          i -> array_to_string(ts[i:i+2], ' ') = 'slow hash batch') AS ss
             |      FROM tok)
             |SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_occ,
             |       CAST(ss[1] - 1 AS BIGINT) AS first_pos
             |FROM m WHERE len(ss) > 0""".stripMargin)
    ),

    // ---- takedowns: BM25 after id-level deletes ----
    // The lexical tombstone tier: docs with doc_id % 100 = 7 are
    // taken down, reads anti-join the tombstone set and counters
    // track the live corpus, so the oracle is simply BM25 over the
    // corpus WITHOUT those docs — delete must equal republish-without.
    QueryDef(
      "q_text_bm25_deleted",
      "BM25 top-10 after taking down doc_id % 100 = 7 (tombstoned index)",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir).documents
        val path = SessionPublish.once(s, s"lexindex-del|$dir") {
          val p = SessionPublish.tempDir("graft-lexindex-del")
          Retrieval.publishIndex(docs, "doc_id", col("text"), p, buckets = 16)
          val victims = docs.filter(col("doc_id") % 100 === 7)
            .select(col("doc_id")).as[Long].collect().toSeq
          Retrieval.deleteDocs(s, p, victims)
          p
        }
        Retrieval.searchIndex(s, path, terms, 10)
          .select(col("id").as("doc_id"), col("bm25"), col("rnk"))
      },
      Some(s"""WITH ${bm25CtesOver("(SELECT * FROM documents WHERE doc_id % 100 <> 7)")}
              |SELECT doc_id, bm25, CAST(rnk AS BIGINT) AS rnk
              |FROM bm WHERE rnk <= 10""".stripMargin)
    ),

    // ---- full lexical lifecycle, compacted ----
    // publish(evens) -> append(odds) -> delete(doc_id % 100 = 3) ->
    // versioned compaction (atomic pointer flip). The compacted index
    // has NO overlays left — tombstones and counter deltas are gone,
    // the postings are one clean file set per bucket — yet must score
    // bit-identically to a republish of the live corpus, which is
    // exactly what the oracle computes.
    QueryDef(
      "q_text_bm25_compacted",
      "BM25 top-10 via the compacted index (publish + append + takedown folded into v2)",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir).documents
        val root = SessionPublish.once(s, s"lexindex-compact|$dir") {
          val r = SessionPublish.tempDir("graft-lexindex-compact")
          graft.core.Versions.publish(r) { v1 =>
            Retrieval.publishIndex(docs.filter(col("doc_id") % 2 === 0),
              "doc_id", col("text"), v1, buckets = 16)
            Retrieval.appendIndex(docs.filter(col("doc_id") % 2 === 1),
              "doc_id", col("text"), v1)
            val victims = docs.filter(col("doc_id") % 100 === 3)
              .select(col("doc_id")).as[Long].collect().toSeq
            Retrieval.deleteDocs(s, v1, victims)
          }
          Retrieval.compactIndexVersioned(s, r): Unit
          r
        }
        val path = graft.core.Versions.currentPath(root).get
        Retrieval.searchIndex(s, path, terms, 10)
          .select(col("id").as("doc_id"), col("bm25"), col("rnk"))
      },
      Some(s"""WITH ${bm25CtesOver("(SELECT * FROM documents WHERE doc_id % 100 <> 3)")}
              |SELECT doc_id, bm25, CAST(rnk AS BIGINT) AS rnk
              |FROM bm WHERE rnk <= 10""".stripMargin)
    ),

    // ---- hybrid retrieval: reciprocal-rank fusion ----
    // BM25 top-20 fused with cosine top-20 (query = vec 0's own
    // embedding; doc_id and vec_id share the id space by
    // construction). Ranks are small exact ints, so the fused score
    // is identical double arithmetic on both engines; absent legs
    // rank 0 (sentinel) and contribute nothing.
    QueryDef(
      "q_hybrid_rrf",
      "RRF fusion (k=60) of BM25 top-20 and dense cosine top-20",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val t = Tables(s, dir)
        val bmLeg = Retrieval.bm25TopK(t.documents, "doc_id", col("text"), terms, 20)
        val emb = t.embeddings
        val q = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0)
        val w = Window.orderBy(col("cos").desc, col("vec_id").asc)
        // distributed TakeOrdered first; the rank window sees 20 rows
        val cosLeg = emb.filter(col("vec_id") =!= 0L)
          .withColumn("cos", round(graft.functions.CosineSim.col(col("embedding"), graft.functions.Lits.floats(q)), 6))
          .filter(!isnan(col("cos")) && col("cos").isNotNull)
          .orderBy(col("cos").desc, col("vec_id").asc)
          .limit(20)
          .withColumn("rnk", row_number().over(w).cast("long"))
        Retrieval.rrfFuse(Seq((bmLeg, "doc_id", "rnk"), (cosLeg, "vec_id", "rnk")))
          .select(col("id"), round(col("rrf"), 9).as("rrf"),
            coalesce(col("rnk_0"), lit(0L)).as("rnk_bm25"),
            coalesce(col("rnk_1"), lit(0L)).as("rnk_cos"))
          .orderBy(col("rrf").desc, col("id").asc)
          .limit(10)
      },
      Some(s"""WITH $bm25Ctes,
              |$cosCte,
              |fused AS (
              |  SELECT coalesce(bm.doc_id, cr.vec_id) AS id,
              |         coalesce(${d(1.0)} / (${d(60.0)} + bm.rnk), ${d(0.0)})
              |       + coalesce(${d(1.0)} / (${d(60.0)} + cr.rnk), ${d(0.0)}) AS rrf,
              |         coalesce(bm.rnk, 0) AS rnk_bm25,
              |         coalesce(cr.rnk, 0) AS rnk_cos
              |  FROM (SELECT * FROM bm WHERE rnk <= 20) bm
              |  FULL OUTER JOIN (SELECT * FROM cr WHERE rnk <= 20) cr
              |    ON bm.doc_id = cr.vec_id)
              |SELECT id, round(rrf, 9) AS rrf,
              |       CAST(rnk_bm25 AS BIGINT) AS rnk_bm25,
              |       CAST(rnk_cos AS BIGINT) AS rnk_cos
              |FROM fused ORDER BY rrf DESC, id LIMIT 10""".stripMargin)
    )
  )
}

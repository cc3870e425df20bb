package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sources.Tables

/** Similarity search over `embeddings` (ARRAY<FLOAT> x 64). Scores
  * are rounded to 6 decimals before ranking so results are
  * reproducible across engines that sum in element order.
  */
object SimilarityQueries extends QueryModule {

  private val DIM = 64

  /** DuckDB-side deterministic hyperplane sign for (p, d). */
  private def signSql(p: Int, d: Int) =
    s"(CASE WHEN CAST(('0x' || substr(md5('${p}_$d'), 1, 2)) AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END)"

  /** DuckDB-side hyperplane bucket id over `planes` planes for a
    * DOUBLE[] column `e` — the SQL twin of [[Similarity.lshBucket]].
    */
  private def bucketSql(planes: Int): String =
    (0 until planes).map { p =>
      val terms = (0 until DIM).map(d => s"e[${d + 1}] * ${signSql(p, d)}").mkString(" + ")
      s"CASE WHEN ($terms) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  /** Trained SemDeDup centroids for the deferred oracles, keyed per
    * gate (the full-corpus and incremental gates train on different
    * slices).
    */
  private object SemState {
    @volatile private var m: Map[String, Array[Array[Float]]] = Map.empty
    def record(q: String, cents: Array[Array[Float]]): Unit =
      synchronized { m += q -> cents }
    def cents(q: String): Array[Array[Float]] = m.getOrElse(q,
      throw new IllegalStateException(
        s"semdedup centroids for $q not recorded — run the query first"))
  }

  /** Plane counts the embed-mining builds actually used, recorded for
    * their DEFERRED oracles: the count is corpus-sized
    * ([[Similarity.autoPlanes]]), so the exact SQL depends on the run.
    */
  private object EmbedOracleState {
    @volatile var planes: Map[String, Int] = Map.empty
    def record(q: String, p: Int): Unit = synchronized { planes += q -> p }
    def of(q: String): Int = planes.getOrElse(q,
      throw new IllegalStateException(s"plane count for $q not recorded — run the query first"))
  }

  /** Train an IVF index and publish the corpus partitioned by cell —
    * once per (application, dir, nlist); the index build is ingest
    * cost, the probed queries below measure the read-side payoff
    * (partition-pruned scans).
    */
  private def ivfLayout(s: org.apache.spark.sql.SparkSession, dir: String,
      nlist: Int): (graft.pipeline.Ivf.IvfIndex, String) =
    SessionPublish.once(s, s"ivf|$dir|$nlist") {
      val emb  = Tables(s, dir).embeddings
      val idx  = graft.pipeline.Ivf.train(s, emb, "vec_id", "embedding", nlist)
      val path = SessionPublish.tempDir("graft-ivf")
      graft.pipeline.Ivf.writePartitioned(emb, "embedding", idx, path)
      (idx, path)
    }

  /** Versioned layout root: v1 published from HALF the corpus, v2
    * from all of it, each a complete cell-partitioned layout under
    * `v=N/` with the `_current` pointer flipped per publish
    * ([[graft.core.Versions]]) — once per (application, dir). The
    * gate resolves the pointer and must land on v2 COMPLETE.
    */
  private def versionedIvfLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): (graft.pipeline.Ivf.IvfIndex, String) =
    SessionPublish.once(s, s"ivfversioned|$dir") {
      val emb = Tables(s, dir).embeddings
      val idx = graft.pipeline.Ivf.train(s, emb, "vec_id", "embedding", nlist = 8)
      val root = SessionPublish.tempDir("graft-ivf-versions") + "/root"
      graft.core.Versions.publish(root) { d =>
        graft.pipeline.Ivf.writePartitioned(
          emb.filter(col("vec_id") % 2 === 0), "embedding", idx, d)
      }
      graft.core.Versions.publish(root) { d =>
        graft.pipeline.Ivf.writePartitioned(emb, "embedding", idx, d)
      }
      (idx, root)
    }

  /** Incremental-ingestion layout: train + publish on the BASE corpus
    * (vec_id % 5 != 0 besides the query vector), then APPEND the
    * batch (vec_id % 5 = 0, vec_id != 0) with the base-trained
    * centroids — once per (application, dir). The gate then proves
    * appended vectors surface in probed search exactly.
    */
  private def ivfIncrementalLayout(s: org.apache.spark.sql.SparkSession, dir: String,
      nlist: Int): (graft.pipeline.Ivf.IvfIndex, String) =
    SessionPublish.once(s, s"ivfinc|$dir|$nlist") {
      val emb   = Tables(s, dir).embeddings
      val base  = emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") === 0L)
      val batch = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0L)
      val idx   = graft.pipeline.Ivf.train(s, base, "vec_id", "embedding", nlist)
      val path  = SessionPublish.tempDir("graft-ivf-inc")
      graft.pipeline.Ivf.writePartitioned(base, "embedding", idx, path)
      graft.pipeline.Ivf.appendPartitioned(batch, "embedding", idx, path)
      (idx, path)
    }

  /** Delete + compaction layout: publish the full corpus, tombstone
    * vec_id % 7 == 3 (never 0, the query vector), then compact into a
    * FRESH layout — once per (application, dir). The delete gate reads
    * the tombstoned layout (anti-join path); the compact gate reads
    * the rewritten one (rows physically purged, no join) — same
    * oracle, two different mechanisms producing it.
    */
  private def ivfDeleteLayout(s: org.apache.spark.sql.SparkSession, dir: String,
      nlist: Int): (graft.pipeline.Ivf.IvfIndex, String, String) =
    SessionPublish.once(s, s"ivfdel|$dir|$nlist") {
      val emb  = Tables(s, dir).embeddings
      val idx  = graft.pipeline.Ivf.train(s, emb, "vec_id", "embedding", nlist)
      val path = SessionPublish.tempDir("graft-ivf-del")
      graft.pipeline.Ivf.writePartitioned(emb, "embedding", idx, path)
      graft.pipeline.Tombstones.delete(path,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id")
      val compacted = SessionPublish.tempDir("graft-ivf-compact")
      graft.pipeline.Ivf.compactPartitioned(s, path, compacted, "vec_id")
      (idx, path, compacted)
    }

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Array[Float] =
    Tables(s, dir).embeddings.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  /** The exact trained centroids behind the session's published IVF
    * layout, recorded by the probed-query builds for their DEFERRED
    * oracles ([[graft.queries.Oracle.deferred]]): probe semantics are
    * SQL-expressible only once the centroid values are known, and they
    * are known only after training ran. Verify runs every query before
    * dumping oracle SQL, so the state is always set by render time
    * (and a missing value fails only this oracle, not the dump).
    */
  private object IvfOracleState {
    @volatile var centroids: Option[Array[Array[Float]]] = None
  }

  // ---- centroid-literal SQL rendering for the deferred oracles ----
  // Every constant goes through a string cast ('…'::DOUBLE): DuckDB
  // parses bare decimal literals as DECIMAL, and only the string form
  // guarantees the exact nearest-double round-trip of Double.toString.
  private def dlit(x: Double): String = s"'$x'::DOUBLE"

  /** Same fold as NearestCell's cached |c|²: left-to-right over dims. */
  private def c2Of(c: Array[Float]): Double =
    c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)

  /** `|c|² - 2 v·c` with NearestCell's exact arithmetic: dot terms
    * (centroid * element) summed left-to-right in doubles.
    */
  private def cellDistSql(c: Array[Float], v: String): String = {
    val dot = c.indices.map(d => s"${dlit(c(d).toDouble)} * $v[${d + 1}]").mkString(" + ")
    s"${dlit(c2Of(c))} - 2.0 * ($dot)"
  }

  /** First-wins argmin cell id via lexicographic sort of [dist, cell]
    * pairs — NearestCell's strict-< scan keeps the lower cell on ties,
    * exactly what (dist, cell) ascending yields.
    */
  private def cellSql(cents: Array[Array[Float]], v: String): String = {
    val entries = cents.zipWithIndex
      .map { case (c, i) => s"[${cellDistSql(c, v)}, CAST($i AS DOUBLE)]" }
      .mkString(", ")
    s"CAST(list_sort([$entries])[1][2] AS INT)"
  }

  /** `np` probe cells ascending by the given per-cell distance SQL
    * (ties to the lower cell id), as an INT list.
    */
  private def probeListSql(cents: Array[Array[Float]], np: Int,
      distSql: (Array[Float], String) => String, v: String): String = {
    val entries = cents.zipWithIndex
      .map { case (c, i) => s"[${distSql(c, v)}, CAST($i AS DOUBLE)]" }
      .mkString(", ")
    s"list_transform(list_sort([$entries])[1:$np], x -> CAST(x[2] AS INT))"
  }

  /** Squared Euclidean distance with [[graft.pipeline.Ivf.probeOrder]]'s
    * exact arithmetic: (v_i - c_i)² accumulated left-to-right.
    */
  private def euclidDistSql(c: Array[Float], v: String): String =
    c.indices.map { d =>
      s"($v[${d + 1}] - ${dlit(c(d).toDouble)}) * ($v[${d + 1}] - ${dlit(c(d).toDouble)})"
    }.mkString(" + ")

  private def trainedCentroids: Array[Array[Float]] =
    IvfOracleState.centroids.getOrElse(
      throw new IllegalStateException(
        "IVF centroids not recorded — run the probed IVF queries before rendering their oracles"))

  override def queries: Seq[QueryDef] = Seq(
    // ---- brute-force cosine top-k against a stored query vector ----
    QueryDef(
      "q_ann_bruteforce",
      "top-10 cosine neighbors of vec 0, brute force over the corpus",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        // fetch the query vector once (tiny driver action), then one scan
        val q = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0)
        Similarity.topK(emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q, 10,
          graft.functions.CosineSim.col)
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- int8 scalar quantization (embedding compression) ----
    // 4x smaller vectors for the ANN tier; the gate pins scale,
    // integer checksum, saturation count, and the max dequantization
    // error (max is order-independent — safe where a double sum of
    // per-element errors would not be).
    QueryDef(
      "q_embed_quantize",
      "per-vector int8 quantization: scale, checksum, saturation, max error",
      (s, dir) =>
        Similarity.quantizeInt8(Tables(s, dir).embeddings, "vec_id", "embedding")
          .select(col("vec_id"),
            round(col("scale"), 6).as("scale"),
            expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_q"),
            size(filter(col("q"), x => abs(x) === 127)).cast("long").as("n_sat"),
            expr("round(array_max(transform(sequence(1, size(v)), " +
              "i -> abs(CAST(element_at(v, i) AS DOUBLE) - element_at(q, i) * scale / 127.0))), 6)")
              .as("max_err")),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale
             |      FROM e),
             |q AS (SELECT vec_id, v, scale,
             |        list_transform(v, x -> CAST(round(x / scale * 127, 0) AS INT)) AS q
             |      FROM s WHERE scale > 0)
             |SELECT vec_id, round(scale, 6) AS scale,
             |  CAST(list_sum(q) AS BIGINT) AS sum_q,
             |  CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
             |  round(list_max(list_transform(range(1, len(v) + 1),
             |        i -> abs(v[i] - q[i] * scale / 127.0))), 6) AS max_err
             |FROM q""".stripMargin)
    ),

    // ---- embedding near-duplicate pairs (cosine >= 0.40) ----
    // brute-force pair scan at small SF; the scale path buckets by
    // LSH first (next query) and verifies within buckets. Threshold
    // 0.40 because this synthetic corpus has no true near-dups (max
    // pairwise cosine ≈ 0.45): at the production 0.99 the gate row
    // set is provably empty and verifies NOTHING — the mechanics
    // (blocked pair join + exact verify) are identical at any cut.
    QueryDef(
      "q_dedup_embed",
      "embedding near-dup pairs: cosine >= 0.40 (label-blocked join)",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"), col("label").as("la"))
        val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("label").as("lb"))
        a.join(b, col("la") === col("lb") && col("va") < col("vb"))
          .withColumn("cos", round(graft.functions.CosineSim.col(col("ea"), col("eb")), 6))
          .filter(col("cos") >= 0.40)
          .select(col("va"), col("vb"), col("cos"))
      },
      Some("""SELECT a.vec_id AS va, b.vec_id AS vb,
             |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.40""".stripMargin)
    ),

    // ---- LSH-blocked similarity pairs (embedding dedup at scale) ----
    // The label-blocked q_dedup_embed pair join is corpus² within a
    // label; this is the 100 TB shape: pairs must share an LSH bucket,
    // then verify exact cosine. The plane count is CORPUS-SIZED
    // (autoPlanes): a fixed count makes the blocked pair space grow
    // quadratically with the corpus (measured 0.9 s → 48 s from 2k to
    // 200k vectors at 8 planes), so the build records the count it
    // used and the DEFERRED oracle renders the same bucket SQL.
    // Threshold 0.25 because this corpus has no true near-dups (max
    // pairwise cosine ≈ 0.45) — the mechanics are identical at any
    // threshold.
    QueryDef(
      "q_dedup_embed_lsh",
      "similar pairs (cosine >= 0.25) among LSH-bucket-blocked candidates (corpus-sized planes)",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        val planes = Similarity.autoPlanes(emb.count())
        EmbedOracleState.record("q_dedup_embed_lsh", planes)
        Similarity.lshBlockedPairs(emb, "vec_id", "embedding", DIM,
          minCos = 0.25, planes = planes, cosFn = graft.functions.CosineSim.col)
      },
      Oracle.deferred {
        val bits = bucketSql(EmbedOracleState.of("q_dedup_embed_lsh"))
        s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
           |                  CAST($bits AS BIGINT) AS bucket
           |           FROM embeddings)
           |SELECT a.vec_id AS va, c.vec_id AS vb,
           |  round(list_dot_product(a.e, c.e) /
           |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS cos
           |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
           |WHERE round(list_dot_product(a.e, c.e) /
           |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6) >= 0.25""".stripMargin
      }
    ),

    // ---- SemDeDup: k-means-cell-blocked semantic dedup ----
    // The cluster-blocked form of embedding dedup (Abbas et al. '23):
    // train 8 coarse cells (the IVF trainer), compare pairs only
    // WITHIN a cell, drop every doc with a smaller-id cell-mate at
    // cosine >= 0.40, emit the kept (vec_id, cell) rows. The deferred
    // oracle re-derives the assignment from the trained centroids as
    // literals (NearestCell's exact double arithmetic, the PQ-codes
    // discipline) and replays the keep rule in SQL — the TRAINED cell
    // ids themselves are gated, not just the survivor set. Threshold
    // 0.40 because this synthetic corpus has no true near-dups (max
    // pairwise cosine ≈ 0.45) — mechanics identical at any cut.
    QueryDef(
      "q_dedup_semantic",
      "SemDeDup survivors: within-k-means-cell cosine >= 0.40 drops the larger id",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        val idx = graft.pipeline.Ivf.train(s, emb, "vec_id", "embedding", nlist = 8)
        SemState.record("q_dedup_semantic", idx.centroids)
        graft.pipeline.Similarity.semDedup(emb, "vec_id", "embedding", idx,
          minCos = 0.40, cosFn = graft.functions.CosineSim.col)
      },
      Oracle.deferred {
        val cents = SemState.cents("q_dedup_semantic")
        s"""WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |c AS MATERIALIZED (SELECT vec_id, e, ${AnnOracleSql.argminSql(cents, "e")} AS cell FROM c0),
           |d AS (SELECT DISTINCT b.vec_id FROM c a JOIN c b
           |      ON a.cell = b.cell AND a.vec_id < b.vec_id
           |      WHERE round(list_dot_product(a.e, b.e) /
           |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.40)
           |SELECT c.vec_id, c.cell FROM c LEFT JOIN d ON c.vec_id = d.vec_id
           |WHERE d.vec_id IS NULL""".stripMargin
      }
    ),

    // ---- incremental SemDeDup: batch status via the published cell
    // index — the semantic leg of the O(batch) ingestion story (text
    // bands, embed buckets, ANN cells, CDC chunks all have one). The
    // warmup rep pays the corpus train + cell publish (memoized);
    // timed reps measure batch assignment (one codegen expression) +
    // a pair join against ONLY the batch-hit cells. The keep rule is
    // existential over ALL docs, so the oracle is the full mine over
    // corpus ∪ batch (same frozen centroids) restricted to batch ids
    // — the equivalence the incremental path must preserve exactly.
    QueryDef(
      "q_dedup_semantic_incremental",
      "kept batch rows (vec_id%7=3) via the published cell index == full SemDeDup restricted to the batch",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        val corpus = emb.filter(col("vec_id") % 7 =!= 3)
        val batch = emb.filter(col("vec_id") % 7 === 3)
        val (idx, cellsPath) = SessionPublish.once(s, s"semdedup_cells|$dir") {
          val i = graft.pipeline.Ivf.train(s, corpus, "vec_id", "embedding", nlist = 8)
          val p = SessionPublish.tempDir("graft-semdedup") + "/cells"
          corpus.select(col("vec_id").as("id"),
            graft.pipeline.Ivf.assign(col("embedding"), i).as("cell"))
            .write.mode("overwrite").parquet(p)
          (i, p)
        }
        SemState.record("q_dedup_semantic_incremental", idx.centroids)
        graft.pipeline.Similarity.semDedupIncremental(corpus,
          s.read.parquet(cellsPath), batch, "vec_id", "embedding", idx,
          minCos = 0.40, cosFn = graft.functions.CosineSim.col)
      },
      Oracle.deferred {
        val cents = SemState.cents("q_dedup_semantic_incremental")
        s"""WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |c AS MATERIALIZED (SELECT vec_id, e, ${AnnOracleSql.argminSql(cents, "e")} AS cell FROM c0),
           |d AS (SELECT DISTINCT b.vec_id FROM c a JOIN c b
           |      ON a.cell = b.cell AND a.vec_id < b.vec_id
           |      WHERE round(list_dot_product(a.e, b.e) /
           |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.40)
           |SELECT c.vec_id, c.cell FROM c LEFT JOIN d ON c.vec_id = d.vec_id
           |WHERE d.vec_id IS NULL AND c.vec_id % 7 = 3""".stripMargin
      }
    ),

    // ---- incremental embedding near-dup mining: batch vs the
    // PUBLISHED bucket index — the embedding leg of the O(batch)
    // ingestion story (text bands: q_dedup_incremental; ANN cells:
    // q_ann_ivf_incremental). The warmup rep pays the one-off corpus
    // bucket publish (memoized per session); timed reps measure batch
    // bucketing + index join + candidate-only verification ----
    QueryDef(
      "q_dedup_embed_incremental",
      "similar pairs (cosine >= 0.25) involving the vec_id%7=3 batch, via the published bucket index",
      (s, dir) => {
        graft.functions.CosineSim.register(s)
        val emb = Tables(s, dir).embeddings
        val corpus = emb.filter(col("vec_id") % 7 =!= 3)
        val batch  = emb.filter(col("vec_id") % 7 === 3)
        // corpus-sized planes (see q_dedup_embed_lsh); the published
        // index is keyed by the count so probe and index always agree
        val planes = Similarity.autoPlanes(corpus.count())
        EmbedOracleState.record("q_dedup_embed_incremental", planes)
        val bucketsPath = SessionPublish.once(s, s"embed_buckets|$dir|$planes") {
          val p = SessionPublish.tempDir("graft-embed-buckets") + "/buckets"
          Similarity.publishBucketTable(corpus, "vec_id", "embedding", DIM, planes, p)
          p
        }
        Similarity.lshBlockedPairsIncremental(corpus,
          Similarity.openBucketTable(s, bucketsPath, DIM, planes),
          batch, "vec_id", "embedding", DIM, minCos = 0.25, planes = planes,
          cosFn = graft.functions.CosineSim.col)
      },
      // oracle: the FULL bucket-blocked mine (same recorded plane
      // count) filtered to pairs with a batch endpoint — the
      // equivalence the incremental path must keep
      Oracle.deferred {
        val bits = bucketSql(EmbedOracleState.of("q_dedup_embed_incremental"))
        s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
           |                  CAST($bits AS BIGINT) AS bucket
           |           FROM embeddings)
           |SELECT a.vec_id AS va, c.vec_id AS vb,
           |  round(list_dot_product(a.e, c.e) /
           |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS cos
           |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
           |WHERE (a.vec_id % 7 = 3 OR c.vec_id % 7 = 3)
           |  AND round(list_dot_product(a.e, c.e) /
           |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6) >= 0.25""".stripMargin
      }
    ),

    // ---- vector norms (feature hygiene: catch zero/degenerate) ----
    QueryDef(
      "q_embed_norms",
      "L2 norm per embedding, rounded — degenerate-vector detection",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        emb.select(col("vec_id"),
          round(Similarity.norm(col("embedding")), 6).as("l2"))
      },
      Some("""SELECT vec_id,
             |round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
             |FROM embeddings""".stripMargin)
    ),

    // ---- IVF ANN: coarse k-means cells + probed search ----
    // Gate variant probes nprobe = nlist: every cell passes the probe
    // filter, so the result is provably the brute-force top-k — the
    // ulp-sensitive trained centroids cannot move it, and the
    // brute-force SQL is an exact oracle. The `cell` column (training-
    // dependent) is dropped. Partial-probe recall (nprobe=3) is
    // asserted in IvfSpec.
    QueryDef(
      "q_ann_ivf",
      "IVF top-10: train 8 cells (2 Lloyd iters), probe all 8 (≡ brute force)",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        val idx = graft.pipeline.Ivf.train(s, emb, "vec_id", "embedding", nlist = 8)
        val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
          .head().getSeq[Float](0).toArray
        graft.pipeline.Ivf.topK(s, emb.filter(col("vec_id") =!= 0L),
          "vec_id", "embedding", idx, q, k = 10, nprobe = idx.nlist)
          .drop("cell")
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- IVF over the published cell-PARTITIONED layout ----
    // Same gate shape as q_ann_ivf (nprobe = nlist ≡ brute force, so
    // the brute-force SQL is an exact oracle), but the corpus is read
    // from the cell-partitioned publish: assignment happened at write
    // time, the probe filter prunes partitions, and NearestCell never
    // runs at query time. IvfSpec pins selectedPartitions == nprobe.
    QueryDef(
      "q_ann_ivf_partitioned",
      "IVF top-10 over the cell-partitioned published corpus, probe all cells (≡ brute force)",
      (s, dir) => {
        val (idx, path) = ivfLayout(s, dir, nlist = 8)
        graft.pipeline.Ivf.topKPartitioned(s, path, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = idx.nlist,
          pred = col("vec_id") =!= 0L)
          .drop("cell")
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- versioned republish: retrain/republish swaps ATOMICALLY
    // under live readers via a v=N/_current pointer root
    // (graft.core.Versions). v1 holds half the corpus, v2 all of it;
    // the read resolves the pointer once and probes the resolved
    // layout — landing on v2 complete, never a half-written mix, so
    // probe-all ≡ brute force over the FULL corpus is an exact
    // oracle (a torn read could not produce it) ----
    QueryDef(
      "q_ann_ivf_versioned",
      "IVF top-10 over the LIVE version (v2 of 2) of a versioned layout root",
      (s, dir) => {
        val (idx, root) = versionedIvfLayout(s, dir)
        val path = graft.core.Versions.currentPath(root).getOrElse(
          throw new IllegalStateException(s"no live version at $root"))
        graft.pipeline.Ivf.topKPartitioned(s, path, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = idx.nlist,
          pred = col("vec_id") =!= 0L)
          .drop("cell")
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- incremental ANN ingestion: batch appended to the published
    // layout with base-trained centroids; nprobe = nlist ≡ brute
    // force over base ∪ batch, so the oracle is the full-corpus
    // brute-force SQL — appended vectors MUST surface exactly ----
    QueryDef(
      "q_ann_ivf_incremental",
      "IVF top-10 after appending the vec_id%5=0 batch to the published layout",
      (s, dir) => {
        val (idx, path) = ivfIncrementalLayout(s, dir, nlist = 8)
        graft.pipeline.Ivf.topKPartitioned(s, path, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = idx.nlist,
          pred = col("vec_id") =!= 0L)
          .drop("cell")
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- id-level DELETES over the published layout (tombstones) ----
    // nprobe = nlist ≡ brute force over the SURVIVING corpus, so the
    // oracle is plain SQL minus the deleted ids — the anti-join read
    // path must hide exactly the tombstoned set. TombstoneSpec pins
    // the mechanics (atomic batch visibility, append-after-delete,
    // join-free plan when no tombstones exist).
    QueryDef(
      "q_ann_ivf_delete",
      "IVF top-10 after tombstoning vec_id%7=3 in the published layout (anti-join read)",
      (s, dir) => {
        val (idx, path, _) = ivfDeleteLayout(s, dir, nlist = 8)
        graft.pipeline.Ivf.topKPartitioned(s, path, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = idx.nlist,
          pred = col("vec_id") =!= 0L)
          .drop("cell")
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0 AND vec_id % 7 <> 3
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- compaction of the tombstoned layout ----
    // Same oracle as the delete gate, but the layout was REWRITTEN:
    // deleted rows physically purged, per-cell files coalesced, the
    // geometry sidecar carried (the guarded read path still verifies
    // fingerprints), and no anti join left in the plan.
    QueryDef(
      "q_ann_ivf_compact",
      "IVF top-10 over the compacted layout (deleted rows purged, files coalesced)",
      (s, dir) => {
        val (idx, _, compacted) = ivfDeleteLayout(s, dir, nlist = 8)
        graft.pipeline.Ivf.topKPartitioned(s, compacted, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = idx.nlist,
          pred = col("vec_id") =!= 0L)
          .drop("cell")
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], qv) /
             |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0 AND vec_id % 7 <> 3
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    ),

    // ---- IVF partial probe over the partitioned layout (scale path) ----
    // nprobe=2 of 8: the scan lists and reads 1/4 of the corpus files.
    // Training-dependent, yet still exactly verifiable: the build
    // records the trained centroids, and a DEFERRED oracle re-derives
    // in SQL — from those values as literals — each vector's argmin
    // cell (NearestCell's exact arithmetic), the 2-cell probe list
    // (probeOrder's exact arithmetic), and the in-probe cosine top-10.
    QueryDef(
      "q_ann_ivf_probe",
      "IVF top-10 probing 2/8 cells of the partitioned corpus (partition-pruned scan)",
      (s, dir) => {
        val (idx, path) = ivfLayout(s, dir, nlist = 8)
        IvfOracleState.centroids = Some(idx.centroids)
        graft.pipeline.Ivf.topKPartitioned(s, path, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = 2,
          pred = col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val cents = trainedCentroids
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${cellSql(cents, "e")} AS cell FROM v),
           |q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q)
           |SELECT a.vec_id, round(list_dot_product(a.e, q.qv) /
           |  (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos,
           |  a.cell
           |FROM a, q, p WHERE a.vec_id <> 0 AND list_contains(p.probes, a.cell)
           |ORDER BY cos DESC, a.vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ---- FILTERED (hybrid) ANN: metadata predicate + probed search ----
    // The retrieval shape real pipelines run constantly: "nearest
    // neighbors among rows WHERE <predicate>". The label filter is a
    // plain data filter pushed into the parquet scan (PushedFilters —
    // IvfSpec pins it) UNDER the partition-pruning cell filter, so the
    // probe reads nprobe/nlist of the files and row-group-skips
    // non-matching labels within them — post-filtering the k results
    // would instead return FEWER than k rows whenever the filter is
    // selective. Same deferred-oracle mechanics as q_ann_ivf_probe
    // with the predicate applied to the candidate set.
    QueryDef(
      "q_ann_ivf_filtered",
      "hybrid search: top-10 among label=3 rows, probing 2/8 cells (pushed filter + pruned scan)",
      (s, dir) => {
        val (idx, path) = ivfLayout(s, dir, nlist = 8)
        IvfOracleState.centroids = Some(idx.centroids)
        graft.pipeline.Ivf.topKPartitioned(s, path, "vec_id", "embedding",
          idx, queryVec(s, dir), k = 10, nprobe = 2,
          pred = col("label") === 3 && col("vec_id") =!= 0L)
      },
      Oracle.deferred {
        val cents = trainedCentroids
        s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, label, e, ${cellSql(cents, "e")} AS cell FROM v),
           |q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
           |p AS (SELECT ${probeListSql(cents, 2, euclidDistSql, "qv")} AS probes FROM q)
           |SELECT a.vec_id, round(list_dot_product(a.e, q.qv) /
           |  (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos,
           |  a.cell
           |FROM a, q, p
           |WHERE a.vec_id <> 0 AND a.label = 3 AND list_contains(p.probes, a.cell)
           |ORDER BY cos DESC, a.vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ---- batch kNN JOIN over the partitioned layout (probe-all) ----
    // The pipeline's dominant ANN shape: top-10 for EVERY query of a
    // set in one job. nprobe = nlist makes it provably per-query brute
    // force, so the oracle is plain SQL (cross join + rank window) with
    // no centroid dependence; the partial-probe twin below gates the
    // pruned path. IvfBatchSpec pins the plan (pruned corpus scan,
    // broadcast query side, narrow-triple rank shuffle).
    QueryDef(
      "q_ann_topk_batch",
      "batch kNN join: top-10 per query vector (vec_id < 8), probe all cells (≡ brute force)",
      (s, dir) => {
        val (idx, path) = ivfLayout(s, dir, nlist = 8)
        val qs = Tables(s, dir).embeddings.filter(col("vec_id") < 8)
        graft.pipeline.Ivf.topKBatch(s, path, qs, "vec_id", "embedding",
          "vec_id", "embedding", idx, k = 10, nprobe = idx.nlist,
          pairFilter = col("q_id") =!= col("vec_id"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
             |           FROM embeddings WHERE vec_id < 8),
             |s AS (SELECT q.q_id, e.vec_id,
             |        round(list_dot_product(e.embedding::DOUBLE[], q.qv) /
             |          (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
             |           sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
             |      FROM embeddings e, q WHERE e.vec_id <> q.q_id),
             |r AS (SELECT q_id, vec_id, cos,
             |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
             |      FROM s)
             |SELECT q_id, vec_id, cos FROM r WHERE rk <= 10""".stripMargin)
    ),

    // ---- batch kNN JOIN, partial probe (the 100 TB read path) ----
    // nprobe=2 of 8 per query: each query meets only the corpus rows
    // in its own 2 probe cells, and the corpus scan reads only the
    // union of probed partitions. The deferred oracle re-derives each
    // query's probe list with NearestCells' arithmetic (|c|² - 2 v·c
    // over the centroid literals) and each corpus vector's cell, then
    // ranks within the probed candidates — an exact end-to-end check
    // of the approximate path's semantics.
    QueryDef(
      "q_ann_topk_batch_probe",
      "batch kNN join: top-10 per query vector (vec_id < 8) probing 2/8 cells each",
      (s, dir) => {
        val (idx, path) = ivfLayout(s, dir, nlist = 8)
        IvfOracleState.centroids = Some(idx.centroids)
        val qs = Tables(s, dir).embeddings.filter(col("vec_id") < 8)
        graft.pipeline.Ivf.topKBatch(s, path, qs, "vec_id", "embedding",
          "vec_id", "embedding", idx, k = 10, nprobe = 2,
          pairFilter = col("q_id") =!= col("vec_id"))
      },
      Oracle.deferred {
        val cents = trainedCentroids
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${cellSql(cents, "e")} AS cell FROM v),
           |q AS (SELECT vec_id AS q_id, e AS qv,
           |        ${probeListSql(cents, 2, cellDistSql, "e")} AS probes
           |      FROM v WHERE vec_id < 8),
           |s AS (SELECT q.q_id, a.vec_id,
           |        round(list_dot_product(a.e, q.qv) /
           |          (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
           |      FROM a, q WHERE list_contains(q.probes, a.cell) AND a.vec_id <> q.q_id),
           |r AS (SELECT q_id, vec_id, cos,
           |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
           |      FROM s)
           |SELECT q_id, vec_id, cos FROM r WHERE rk <= 10""".stripMargin
      }
    ),

    // ---- recall@k of the probed path, measured per query ----
    // The quality metric the approximate tiers are tuned by, as a
    // first-class query: per-query |approx top-10 ∩ exact top-10| at
    // nprobe=2, against ground truth from the probe-everything path
    // over the SAME layout. Narrow-triple join + per-query aggregate —
    // id pairs move, vectors never do. The deferred oracle re-derives
    // BOTH legs (probed candidates via the centroid literals, exact
    // via the full corpus) and recomputes the intersection — an exact
    // check of the measurement itself, not just the search.
    QueryDef(
      "q_ann_recall",
      "recall@10 per query (vec_id < 8) of nprobe=2 probed search vs exact ground truth",
      (s, dir) => {
        val (idx, path) = ivfLayout(s, dir, nlist = 8)
        IvfOracleState.centroids = Some(idx.centroids)
        val qs = Tables(s, dir).embeddings.filter(col("vec_id") < 8)
        graft.pipeline.Ivf.recallAtK(s, path, qs, "vec_id", "embedding",
          "vec_id", "embedding", idx, k = 10, nprobe = 2,
          pairFilter = col("q_id") =!= col("vec_id"))
      },
      Oracle.deferred {
        val cents = trainedCentroids
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |a AS (SELECT vec_id, e, ${cellSql(cents, "e")} AS cell FROM v),
           |q AS (SELECT vec_id AS q_id, e AS qv,
           |        ${probeListSql(cents, 2, cellDistSql, "e")} AS probes
           |      FROM v WHERE vec_id < 8),
           |sx AS (SELECT q.q_id, a.vec_id,
           |         round(list_dot_product(a.e, q.qv) /
           |           (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
           |       FROM a, q WHERE a.vec_id <> q.q_id),
           |ex AS (SELECT q_id, vec_id FROM (
           |         SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
           |         FROM sx) WHERE rk <= 10),
           |ap AS (SELECT q_id, vec_id FROM (
           |         SELECT s.q_id, s.vec_id,
           |           row_number() OVER (PARTITION BY s.q_id ORDER BY s.cos DESC, s.vec_id ASC) AS rk
           |         FROM sx s JOIN a ON s.vec_id = a.vec_id
           |                   JOIN q ON s.q_id = q.q_id
           |         WHERE list_contains(q.probes, a.cell)) WHERE rk <= 10)
           |SELECT ex.q_id, CAST(count(ap.vec_id) AS BIGINT) AS hits,
           |  CAST(count(*) AS BIGINT) AS n,
           |  round(count(ap.vec_id) * 1.0 / count(*), 6) AS recall
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
           |GROUP BY ex.q_id""".stripMargin
      }
    ),

    // ---- multi-probe LSH ANN (bucket + Hamming-2 neighbors) ----
    // The gate uses the Hamming-radius probe shape because it is
    // exactly SQL-expressible (bit_count(bucket XOR qb) <= 2); the
    // margin-ordered probeSequence variant is covered by
    // MultiProbeSpec (planted-neighbor recall + exactness at full
    // probe width).
    QueryDef(
      "q_ann_multiprobe",
      "top-10 cosine over buckets within Hamming distance 2 of the query's bucket",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        val q = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0)
        Similarity.annTopKWithin(emb.filter(col("vec_id") =!= 0L),
          "vec_id", "embedding", q, 10, planes = 8, radius = 2)
      },
      Some({
        val bits = (0 until 8).map { p =>
          val terms = (0 until DIM).map(d => s"e[${d + 1}] * ${signSql(p, d)}").mkString(" + ")
          s"CASE WHEN ($terms) > 0 THEN ${1L << p} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |b AS (SELECT vec_id, e, CAST($bits AS BIGINT) AS bucket FROM v),
           |q AS (SELECT e AS qv, bucket AS qb FROM b WHERE vec_id = 0)
           |SELECT vec_id, round(list_dot_product(e, qv) /
           |  (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
           |FROM b, q WHERE vec_id <> 0 AND bit_count(xor(bucket, qb)) <= 2
           |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin
      })
    ),

    // ---- margin-ordered multi-probe LSH ANN (Lv et al., VLDB'07) ----
    // The probe set is the query's bucket plus the bit-flip masks with
    // the smallest summed |margin| — the buckets most likely to hold
    // true neighbors. The oracle re-derives the SAME probe set in SQL:
    // margins, scores, and ranking are written in the identical
    // left-to-right addition order as the Scala probeSequence, so the
    // doubles (and hence the probe list) agree bit-for-bit; ties in
    // score resolve by ascending mask on both sides (stable sort).
    QueryDef(
      "q_ann_multiprobe_margin",
      "top-10 cosine over the 6 margin-ordered probe buckets of the query",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        val q = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0)
        Similarity.annTopK(emb.filter(col("vec_id") =!= 0L),
          "vec_id", "embedding", q, 10, planes = 8, probes = 6)
      },
      Some({
        def planeTerms(p: Int, v: String) =
          (0 until DIM).map(d => s"$v[${d + 1}] * ${signSql(p, d)}").mkString(" + ")
        val bits = (0 until 8).map { p =>
          s"CASE WHEN (${planeTerms(p, "e")}) > 0 THEN ${1L << p} ELSE 0 END"
        }.mkString(" + ")
        val ms    = (0 until 8).map(p => s"(${planeTerms(p, "e")}) AS m$p").mkString(", ")
        val mcols = (0 until 8).map(p => s"m$p").mkString(", ")
        val qbits = (0 until 8).map(p =>
          s"CASE WHEN m$p > 0 THEN ${1L << p} ELSE 0 END").mkString(" + ")
        val score = (0 until 8).map(p =>
          s"(CASE WHEN (r.range & ${1L << p}) <> 0 THEN abs(q.m$p) ELSE 0.0 END)").mkString(" + ")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |m AS (SELECT e AS qv, $ms FROM v WHERE vec_id = 0),
           |qb AS (SELECT qv, $mcols, CAST($qbits AS BIGINT) AS qbucket FROM m),
           |scored AS (SELECT r.range AS mask, q.qbucket, ($score) AS score
           |           FROM range(0, 256) r, qb q),
           |probes AS (SELECT xor(qbucket, mask) AS pb FROM scored
           |           ORDER BY score ASC, mask ASC LIMIT 6),
           |b AS (SELECT vec_id, e, CAST($bits AS BIGINT) AS bucket FROM v)
           |SELECT vec_id, round(list_dot_product(e, qv) /
           |  (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
           |FROM b, qb WHERE vec_id <> 0 AND bucket IN (SELECT pb FROM probes)
           |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin
      })
    ),

    // ---- LSH bucket assignment (the scale path's partitioner) ----
    QueryDef(
      "q_ann_lsh_buckets",
      "8-hyperplane LSH bucket histogram over the embedding corpus",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        emb.select(Similarity.lshBucket(col("embedding"), 8, DIM).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
      },
      Some({
        val bits = (0 until 8).map { p =>
          val terms = (0 until DIM).map(d => s"e[${d + 1}] * ${signSql(p, d)}").mkString(" + ")
          s"CASE WHEN ($terms) > 0 THEN ${1L << p} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
           |SELECT ($bits) AS bucket, count(*) AS n FROM v GROUP BY 1""".stripMargin
      })
    ),

    // ---- greedy k-center diverse core-set (Gonzalez '85) ----
    // Farthest-first traversal from the min-id seed: 4 centers over
    // the embedding corpus, micro-int cosine distances, argmax ties
    // to the smaller id. The full selection trace gates hash-exact:
    // every point's final min distance plus each center's selection
    // order. One narrow (id, vec, mind) state frame, one scan + one
    // TakeOrdered(1) per round — never an N x N distance matrix.
    QueryDef(
      "q_embed_kcenter",
      "4-center farthest-first core-set: selection orders + final min dists",
      (s, dir) => graft.pipeline.Diversity.kCenter(
        s, Tables(s, dir).embeddings, "vec_id", "embedding", k = 4),
      Some {
        def cos(a: String, b: String) =
          s"round(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
            s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
            s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))), 6)"
        def dist(a: String, b: String) =
          s"1000000 - CAST(round(${cos(a, b)} * 1000000, 0) AS BIGINT)"
        val rounds = (2 to 4).map { r =>
          s"""kc$r AS MATERIALIZED (SELECT vec_id, embedding FROM km${r - 1}
             |  ORDER BY mind DESC, vec_id ASC LIMIT 1),
             |km$r AS MATERIALIZED (SELECT e.vec_id, e.embedding,
             |  least(e.mind, ${dist("e.embedding", "c.embedding")}) AS mind
             |  FROM km${r - 1} e, kc$r c)""".stripMargin
        }.mkString(",\n")
        val sel = (1 to 4).map(r =>
          s"SELECT vec_id, CAST($r AS BIGINT) AS sel_order FROM kc$r").mkString(" UNION ALL ")
        s"""WITH kc1 AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
           |km1 AS MATERIALIZED (SELECT e.vec_id, e.embedding,
           |  ${dist("e.embedding", "c.embedding")} AS mind
           |  FROM embeddings e, kc1 c),
           |$rounds,
           |ksel AS ($sel)
           |SELECT m.vec_id, coalesce(s.sel_order, 0) AS sel_order, m.mind AS mind_micro
           |FROM km4 m LEFT JOIN ksel s USING (vec_id)""".stripMargin
      }
    )
  )
}

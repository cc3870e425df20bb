package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — a single scan + one reduce,
  * the right answer up to ~10^7 candidates per query batch.
  * Scale path: random-hyperplane LSH bucketing — bucket assignment is
  * a pure per-row expression (scan-speed), search touches one bucket
  * (a partition-pruned fraction of the corpus). Hyperplane signs are
  * md5-derived, so bucket ids are reproducible anywhere (including
  * the SQL oracle) with no stored model.
  */
object Similarity {

  /** Element-wise double view of a float-array column. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Top-k nearest neighbors of `query` by cosine, deterministic:
    * ordered by (rounded score desc, id). Rounding makes the ordering
    * reproducible across engines summing in the same element order.
    * `cosFn` selects the scorer — default is the composable HOF form;
    * pass `graft.functions.CosineSim.col` (after registering) for the
    * codegen'd single-pass loop (bit-identical results).
    */
  def topK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int,
      cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val q = graft.functions.Lits.floats(query)
    embeddings
      .withColumn("cos", round(cosFn(col(vecCol), q), 6))
      // a zero-norm vector scores NaN (0/0) and NaN sorts ABOVE every
      // double under desc order — drop it rather than return garbage
      .filter(!isnan(col("cos")) && col("cos").isNotNull)
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"))
  }

  /** Deterministic hyperplane sign for (plane, dim): ±1 from the
    * parity of md5("<p>_<d>")'s first hex byte. Same formula is
    * computable in SQL.
    */
  def planeSign(p: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${p}_$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (Integer.parseInt(hex.substring(0, 2), 16) % 2 == 0) 1 else -1
  }

  /** Hyperplane count sized to the corpus — the embedding analog of
    * the graph side's measured `autoBuckets`: with `p` planes the
    * corpus splits into ~2^p hash-uniform buckets, and the blocked
    * pair join does ~N²/2^(p+1) candidate comparisons, so a FIXED p
    * grows quadratically with corpus size (measured: the 8-plane
    * incremental mine went 0.9 s → 48 s from 2k to 200k vectors —
    * 78M candidate pairs; 16 planes would have been ~305k). Sizing
    * p = log2(N / targetBucketRows) keeps per-bucket occupancy — and
    * with it the candidate space per new row — constant at any scale.
    * The trade is recall at LOW thresholds (less-similar vectors stop
    * co-bucketing as p grows); near-identical vectors (the dedup
    * regime) agree on almost every plane, so their recall survives —
    * SimilarityIncrementalSpec pins that 8 and 16 planes find the
    * same near-identical pairs.
    */
  def autoPlanes(corpusRows: Long, targetBucketRows: Int = 32,
      minPlanes: Int = 6, maxPlanes: Int = 20): Int = {
    val want = math.ceil(
      math.log(math.max(corpusRows, 1).toDouble / targetBucketRows) / math.log(2)).toInt
    math.min(maxPlanes, math.max(minPlanes, want))
  }

  /** LSH bucket id: bit p = (v · plane_p > 0). Pure expression. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val signs = graft.functions.Lits.doubles((0 until dim).map(d => planeSign(p, d).toDouble))
      when(dot(vec, signs) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Query-side hyperplane margins m_p = q · plane_p — how far the
    * query sits from each cutting plane. A small |m_p| means bit p is
    * unreliable: true neighbors plausibly land on the other side.
    */
  private def margins(query: Seq[Float], planes: Int): IndexedSeq[Double] =
    (0 until planes).map { p =>
      query.indices.map(i => query(i).toDouble * planeSign(p, i)).sum
    }

  private def bucketOf(ms: Seq[Double]): Long =
    ms.zipWithIndex.map { case (m, p) => if (m > 0) 1L << p else 0L }.sum

  /** Multi-probe sequence (Lv et al., VLDB'07): the query's own
    * bucket first, then buckets obtained by flipping bit subsets in
    * increasing order of summed |margin| — the buckets most likely to
    * hold the query's true neighbors first. Driver-side arithmetic
    * over `planes` doubles; the result is a literal IN-list, so the
    * probe filter still evaluates at scan speed.
    */
  def probeSequence(query: Seq[Float], planes: Int, probes: Int): Seq[Long] = {
    require(planes <= 20, s"probe enumeration is 2^planes; got $planes")
    val ms      = margins(query, planes)
    val qBucket = bucketOf(ms)
    (0L until (1L << planes))
      .sortBy(mask => (0 until planes).collect { case p if (mask & (1L << p)) != 0 => math.abs(ms(p)) }.sum)
      .take(probes)
      .map(qBucket ^ _)
  }

  /** Bucketed ANN. `probes` = 1 searches only the query's bucket (may
    * return < k when the bucket is small); larger values probe the
    * next-most-likely buckets per [[probeSequence]] until the
    * candidate pool is wide enough — `probes` = 2^planes degenerates
    * to exact brute force.
    */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, planes: Int = 8, probes: Int = 1): DataFrame = {
    val dim     = query.length
    val buckets = probeSequence(query, planes, probes)
    val b       = lshBucket(col(vecCol), planes, dim)
    val pred    = if (buckets.size == 1) b === buckets.head else b.isin(buckets: _*)
    topK(embeddings.filter(pred), idCol, vecCol, query, k)
  }

  /** LSH-blocked similarity-pair mining — the scale path for
    * embedding near-duplicate detection. Candidate pairs must share a
    * hyperplane bucket (cutting the corpus² pair space by ~2^planes),
    * then verify by exact cosine ≥ `minCos`. Recall is governed by
    * `planes`: truly near-identical vectors agree on every plane with
    * high probability, and fewer planes trade more candidates for
    * higher recall. Unlike a label-blocked pair join (corpus² within
    * each label), bucket sizes stay uniform because hyperplane signs
    * are hash-derived.
    */
  def lshBlockedPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCos: Double, planes: Int = 8,
      cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val bucket = lshBucket(col(vecCol), planes, dim)
    val a = embeddings.select(col(idCol).as("va"), col(vecCol).as("ea"), bucket.as("ba"))
    val b = embeddings.select(col(idCol).as("vb"), col(vecCol).as("eb"), bucket.as("bb"))
    a.join(b, col("ba") === col("bb") && col("va") < col("vb"))
      .withColumn("cos", round(cosFn(col("ea"), col("eb")), 6))
      .filter(col("cos") >= minCos)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication blocked by
    * trained k-means cells instead of hash buckets. Every embedding
    * assigns to its nearest [[Ivf.IvfIndex]] centroid; within each
    * cell, a document is a semantic duplicate when some SMALLER-id
    * cell-mate sits at cosine >= `minCos` (keep-lowest-id, the same
    * canonical rule as [[graft.pipeline.Dedup]]'s exact groups).
    * Returns the KEPT rows as (idCol, cell).
    *
    * This is the paper's own approximation: only within-cluster pairs
    * are ever compared, so a near-dup pair straddling a cell boundary
    * is deliberately out of scope — that is what makes the operator
    * scale. Pair volume is Σ|cell|², bounded by training nlist
    * corpus-sized ([[Ivf.autoNlist]], nlist ≈ √N ⇒ expected cell size
    * ≈ √N and the pair join ≈ N^1.5 worst-case, vs N² unblocked); at
    * 100 TB the corpus is published cell-partitioned
    * ([[Ivf.writePartitioned]]) so the self-join co-locates without a
    * shuffle. Assignment is one codegen'd expression
    * ([[graft.functions.NearestCell]]) whose exact double arithmetic
    * renders verbatim into the DuckDB oracle (AnnOracleSql.argminSql).
    */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      index: Ivf.IvfIndex, minCos: Double,
      cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val cells = embeddings.select(col(idCol), col(vecCol),
      Ivf.assign(col(vecCol), index).as("cell"))
    val a = cells.select(col(idCol).as("__sa"), col(vecCol).as("__ea"),
      col("cell").as("__ca"))
    val b = cells.select(col(idCol).as("__sb"), col(vecCol).as("__eb"),
      col("cell").as("__cb"))
    val dups = a.join(b, col("__ca") === col("__cb") && col("__sa") < col("__sb"))
      .filter(round(cosFn(col("__ea"), col("__eb")), 6) >= minCos)
      .select(col("__sb").as(idCol)).distinct()
    cells.join(dups, Seq(idCol), "left_anti").select(col(idCol), col("cell"))
  }

  /** O(batch) SemDeDup ingestion: dedup-status of a NEW batch against
    * the standing corpus, via the PUBLISHED (id, cell) assignment
    * table and the FROZEN trained index — the corpus embeddings are
    * touched only in the cells the batch actually hits.
    *
    * Semantics ≡ [[semDedup]] over corpus ∪ batch restricted to batch
    * rows: a batch doc is dropped iff ANY same-cell doc (corpus or
    * batch) with a smaller id sits at cosine >= minCos. The rule is
    * existential over all docs — not just survivors — so the
    * batch-restricted equivalence is exact and the full-mine SQL is
    * the oracle. Returns kept batch rows as (idCol, cell).
    *
    * 100 TB shape: batch assignment is one codegen'd expression; the
    * corpus side prunes to batch-hit cells BEFORE its vectors join
    * (with the cell-partitioned layout of [[Ivf.writePartitioned]]
    * that's partition pruning, not a scan); the pair join is
    * batch × (cell contents), never corpus².
    */
  def semDedupIncremental(corpus: DataFrame, corpusCells: DataFrame,
      batch: DataFrame, idCol: String, vecCol: String,
      index: Ivf.IvfIndex, minCos: Double,
      cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val clash = corpusCells.select(col("id"))
      .join(broadcast(batch.select(col(idCol).as("id")).distinct()), Seq("id"), "left_semi")
      .limit(5).collect().map(_.get(0))
    require(clash.isEmpty,
      s"batch ids already present in the corpus cell index (sample: ${clash.mkString(", ")}) — " +
        "incremental dedup requires disjoint ids")
    // batch assignment is one codegen'd expression over the (small)
    // batch — cheap enough to recompute in each branch of the plan,
    // so no persist/lifecycle management is needed
    val bc = batch.select(col(idCol).as("__bid"), col(vecCol).as("__be"),
      Ivf.assign(col(vecCol), index).as("cell"))
    val hitCells = bc.select(col("cell")).distinct()
    // corpus pool: only batch-hit cells, vectors joined back by id
    val pool = corpusCells.join(broadcast(hitCells), Seq("cell"))
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("__oe")), Seq("id"))
      .select(col("id").as("__oid"), col("__oe"), col("cell"))
      .unionAll(bc.select(col("__bid").as("__oid"), col("__be").as("__oe"), col("cell")))
    val dropped = bc.join(pool, Seq("cell"))
      .filter(col("__oid") < col("__bid"))
      .filter(round(cosFn(col("__oe"), col("__be")), 6) >= minCos)
      .select(col("__bid")).distinct()
    bc.join(dropped, Seq("__bid"), "left_anti")
      .select(col("__bid").as(idCol), col("cell"))
  }

  /** The publishable half of [[lshBlockedPairs]]: each vector's
    * hyperplane bucket as a standing (id, bucket) index. Bucket ids
    * depend only on the vector itself (hash-derived plane signs, no
    * trained state), so a batch bucketed later is bit-identical to
    * re-bucketing — the property [[lshBlockedPairsIncremental]] relies
    * on, and the same contract as [[graft.pipeline.Dedup.bandTable]]
    * for text.
    */
  def bucketTable(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 8): DataFrame =
    embeddings.select(col(idCol).as("id"),
      lshBucket(col(vecCol), planes, dim).as("bucket"))

  // Sidecar I/O goes through graft.core.Sidecar (Hadoop FileSystem
  // API) — hdfs:// and s3a:// index paths work like file:.
  private def bucketMetaPath(path: String) = s"$path/_lsh_meta.properties"

  /** Publish the corpus bucket index with its geometry (planes, dim)
    * recorded in a sidecar, so [[openBucketTable]] can refuse a
    * mismatched read — without the check, probing a 13-plane index
    * with 14-plane batch buckets silently matches nothing and
    * near-dup pairs are LOST, the same failure class the IVF
    * centroid fingerprint turns into an error. Use this pair (not a
    * bare parquet write/read) whenever the plane count is dynamic
    * (e.g. [[autoPlanes]]).
    */
  def publishBucketTable(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, path: String): Unit = {
    bucketTable(embeddings, idCol, vecCol, dim, planes)
      .write.mode("overwrite").parquet(path)
    graft.core.Sidecar.writeProps(bucketMetaPath(path),
      Seq("planes" -> planes.toString, "dim" -> dim.toString))
  }

  /** Read a published bucket index, verifying it was built with the
    * SAME (planes, dim) the caller is about to bucket a batch with.
    */
  def openBucketTable(spark: org.apache.spark.sql.SparkSession, path: String,
      dim: Int, planes: Int): DataFrame = {
    val mp = bucketMetaPath(path)
    val meta = graft.core.Sidecar.readProps(mp).getOrElse(throw new IllegalArgumentException(
      s"no bucket-index sidecar at $mp: the index was not published by " +
        "publishBucketTable — republish with it; probing with unverified " +
        "geometry risks silently matching nothing"))
    require(meta.get("planes").contains(planes.toString) && meta.get("dim").contains(dim.toString),
      s"bucket-index geometry mismatch at $path: published with " +
        s"planes=${meta.getOrElse("planes", "?")} dim=${meta.getOrElse("dim", "?")} but the " +
        s"caller uses planes=$planes dim=$dim — re-derive the plane count from the SAME " +
        "corpus the index was built on, or republish")
    spark.read.parquet(path)
  }

  /** Incremental embedding near-dup mining: a new batch against the
    * PUBLISHED bucket index, never re-bucketing the corpus — the
    * embedding-side analog of [[graft.pipeline.Dedup.nearDuplicatesIncremental]]
    * (text bands) and the third leg of the O(batch) ingestion story.
    *
    *  - candidates = bucket matches with >= 1 endpoint in the batch:
    *    batch-batch and batch-corpus pairs surface, corpus-corpus
    *    pairs (mined when the corpus was built) never re-form;
    *  - when the candidate set is driver-small (the realistic batch
    *    shape) the endpoint ids push into the corpus embedding scan
    *    as an `isin` predicate (row-group pruning) — corpus vectors
    *    are READ only for ids an LSH bucket actually matched; above
    *    the cap, verification joins the full vector set.
    *
    * Equals `lshBlockedPairs(corpus ∪ batch)` restricted to pairs
    * with a batch endpoint (SimilarityIncrementalSpec pins row
    * equality). Ids must be disjoint between corpus and batch —
    * enforced (a reappearing id would silently lose pairs to the
    * self-pair filter), one column-pruned scan of the bucket index
    * against the broadcast batch ids.
    */
  def lshBlockedPairsIncremental(corpus: DataFrame, corpusBuckets: DataFrame,
      newEmb: DataFrame, idCol: String, vecCol: String, dim: Int,
      minCos: Double, planes: Int = 8, maxDriverPairs: Int = 200000,
      cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val clash = corpusBuckets.select(col("id"))
      .join(broadcast(newEmb.select(col(idCol).as("id")).distinct()), Seq("id"), "left_semi")
      .limit(5).collect().map(_.get(0))
    require(clash.isEmpty,
      s"batch ids already present in the corpus bucket index (sample: ${clash.mkString(", ")}) — " +
        "incremental mining requires disjoint ids")
    // the batch bucket table feeds the candidate join twice (probe
    // side and inside the union); persist for the size-probe job so
    // batch bucketing runs once, release as soon as the probe decided
    // the path (same contract as Dedup.nearDuplicatesIncremental —
    // the over-cap distributed path re-derives it, the price of the
    // driver-small common case)
    val nb = bucketTable(newEmb, idCol, vecCol, dim, planes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = corpusBuckets.select(col("id"), col("bucket")).unionAll(nb)
    val cand = nb.select(col("bucket"), col("id").as("na"))
      .join(all.select(col("bucket"), col("id").as("ob")), Seq("bucket"))
      .filter(col("na") =!= col("ob"))
      .select(least(col("na"), col("ob")).as("va"),
        greatest(col("na"), col("ob")).as("vb"))
      .distinct()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("e"))
      .unionAll(newEmb.select(col(idCol).as("id"), col(vecCol).as("e")))
    def verify(pairs: DataFrame, within: DataFrame): DataFrame =
      pairs
        .join(within.select(col("id").as("va"), col("e").as("ea")), Seq("va"))
        .join(within.select(col("id").as("vb"), col("e").as("eb")), Seq("vb"))
        .withColumn("cos", round(cosFn(col("ea"), col("eb")), 6))
        .filter(col("cos") >= minCos)
        .select(col("va"), col("vb"), col("cos"))
    val taken = try cand.take(maxDriverPairs + 1)
    finally nb.unpersist(blocking = false)
    if (taken.length <= maxDriverPairs) {
      val spark = corpus.sparkSession
      val candLit = spark.createDataFrame(
        java.util.Arrays.asList(taken: _*), cand.schema)
      val ids = taken.flatMap(r => Seq(r.get(0), r.get(1))).distinct
      val needed = if (ids.isEmpty) vecs.limit(0) else vecs.filter(col("id").isin(ids.toIndexedSeq: _*))
      verify(candLit, needed)
    } else verify(cand, vecs)
  }

  /** Scalar int8 quantization per vector: `scale = max|x_i|`,
    * `q_i = round(x_i / scale * 127)` ∈ [-127, 127]. 4× smaller
    * vectors (the storage/bandwidth lever for ANN over 100 TB of
    * embeddings: int8 dot products + a float rescale recover cosine
    * to ~1e-2). Pure expressions; all-zero vectors are dropped
    * (nothing to quantize). Returns (idCol, v, scale, q).
    */
  def quantizeInt8(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings.select(col(idCol), col(vecCol).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x.cast("double")))))
      .filter(col("scale") > 0)
      .withColumn("q",
        transform(col("v"), x => round(x.cast("double") / col("scale") * 127, 0).cast("int")))

  /** Hamming-radius probing: search every bucket within `radius` bit
    * flips of the query's bucket. Less targeted than the
    * margin-ordered [[probeSequence]] but expressible as one pure
    * comparison (`bit_count(bucket XOR qBucket) <= radius`) in any
    * SQL engine — the cross-engine-verifiable multi-probe shape.
    */
  def annTopKWithin(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, planes: Int = 8, radius: Int = 1): DataFrame = {
    val dim     = query.length
    val qBucket = bucketOf(margins(query, planes))
    topK(
      embeddings.filter(
        bit_count(lshBucket(col(vecCol), planes, dim).bitwiseXOR(lit(qBucket))) <= radius),
      idCol, vecCol, query, k)
  }
}

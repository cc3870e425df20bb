package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic node embeddings from a random-walk corpus — the step
  * word2vec-style pipelines take after
  * [[GraphAnalytics.skipGramPairs]], engineered for the engine's
  * cross-engine exactness discipline instead of SGNS.
  *
  * Levy & Goldberg (NeurIPS'14, public knowledge) showed skip-gram
  * with negative sampling implicitly factorizes the PPMI matrix of
  * (center, context) co-occurrence counts; factorizing it EXPLICITLY
  * gives embeddings of comparable quality with none of SGNS's
  * hogwild/order nondeterminism. The pipeline:
  *
  *  1. [[ppmiMicro]] — PPMI pair weights as micro-nat integers
  *     (`round(ln·, 6) · 1e6` per cell BEFORE anything sums: integer
  *     arithmetic is order-free, so Spark and DuckDB agree bit-level;
  *     the [[graft.pipeline.TextOps]] LM pattern). One groupBy over
  *     pairs plus two marginal aggregations — all map-side-combined,
  *     shuffles bounded by distinct pairs, never walks.
  *  2. [[train]] — the walk corpus's PPMI matrix is symmetric
  *     (windows are symmetric), so its eigendecomposition IS its SVD:
  *     collect the nnz triplets (loud `maxNodes` cap — at this size
  *     the d×d work is driver-trivial; vocabularies beyond the cap
  *     take [[trainDistributed]], whose driver state is dim×dim),
  *     `eigSym`, keep the top-dim eigenvectors BY MAGNITUDE (for
  *     symmetric M the singular values are |λ| — the SVD ordering
  *     Levy & Goldberg factorize by; PPMI spectra have large negative
  *     tails) with canonical signs (largest-|component| positive,
  *     ties to the lowest index — the [[graft.pipeline.Pca]]
  *     contract), rounded to micro-int literals.
  *  3. [[embeddings]] — `emb(node, k) = Σ_ctx ppmi(node, ctx) ·
  *     v_k(ctx)`, a pure INTEGER mat-vec: for an eigenvector this
  *     equals `λ_k · v_k(node)`, i.e. the eigenvalue-weighted
  *     spectral embedding (Levy & Goldberg's Σ-weighted SVD variant),
  *     computed distributively as one broadcast join + sum groupBy.
  *     Everything after training is oracle-expressible — DuckDB
  *     re-derives the walks, the pairs, the PPMI, and the mat-vec
  *     from literal eigenvectors, so the gate checks the whole
  *     distributed pipeline end-to-end.
  *
  * Reference anchor: walks over the stored adjacency are the
  * `queryStep` expansion iterated (HGraphStorage Query.hs:42-82);
  * the embedding tier is beyond-reference (training-data pipeline
  * surface).
  */
object GraphEmbed {

  /** Trained projection: `contexts(i)` (sorted node ids) row-aligned
    * with `vMicro(i)(k)` = micro-scaled component of eigenvector k;
    * eigenvalues |·|-descending (SVD order), all of them (variance
    * accounting).
    */
  final case class EmbedModel(contexts: Array[Long], vMicro: Array[Array[Long]],
      eigenvalues: Array[Double]) {
    def dim: Int = if (vMicro.isEmpty) 0 else vMicro(0).length
    def nNodes: Int = contexts.length
  }

  /** Positive PMI per (center, context), micro-int:
    * `round(max(0, round(ln(n_cc·N / (n_c·n_ctx)), 6)) · 1e6)` with
    * zero cells dropped (they carry no weight and the oracle mirrors
    * the filter). Count products stay far under 2^53, so the double
    * division is exact-input on both engines.
    */
  def ppmiMicro(pairs: DataFrame): DataFrame = {
    val n = pairs.count()
    val cc = pairs.groupBy(col("center"), col("context")).agg(count(lit(1)).as("n_cc"))
    val nc = pairs.groupBy(col("center")).agg(count(lit(1)).as("n_c"))
    val nx = pairs.groupBy(col("context")).agg(count(lit(1)).as("n_ctx"))
    val ratio = (col("n_cc") * lit(n)).cast("double") /
      (col("n_c") * col("n_ctx")).cast("double")
    cc.join(nc, Seq("center")).join(nx, Seq("context"))
      .select(col("center"), col("context"),
        round(greatest(round(log(ratio), 6), lit(0.0)) * 1e6, 0).cast("long")
          .as("ppmi_micro"))
      .filter(col("ppmi_micro") > 0)
  }

  /** Eigendecomposition of the (symmetric) PPMI matrix from its nnz
    * triplets. Deterministic: micro-int inputs, canonical signs,
    * stable eigenvalue ordering. Fails LOUDLY past `maxNodes` — see
    * the scaladoc for the scale path.
    */
  def train(ppmi: DataFrame, dim: Int, maxNodes: Int = 4096): EmbedModel = {
    val trips = ppmi.select(col("center"), col("context"), col("ppmi_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = trips.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    require(ids.nonEmpty, "empty PPMI matrix: no positive-PMI pairs")
    require(ids.length <= maxNodes,
      s"${ids.length} nodes exceed maxNodes=$maxNodes: driver eigendecomposition " +
        "is capped; raise consciously or reduce the vocabulary")
    require(dim >= 1 && dim <= ids.length,
      s"dim=$dim out of range for ${ids.length} nodes")
    val idx = ids.zipWithIndex.toMap
    val m = breeze.linalg.DenseMatrix.zeros[Double](ids.length, ids.length)
    trips.foreach { case (c, x, v) => m(idx(c), idx(x)) = v / 1e6 }
    // the walk-window pair multiset is symmetric; a caller feeding
    // asymmetric counts would silently get a wrong factorization
    for (i <- ids.indices; j <- i + 1 until ids.length)
      require(m(i, j) == m(j, i),
        s"PPMI not symmetric at (${ids(i)}, ${ids(j)}): ${m(i, j)} vs ${m(j, i)}")
    val es = breeze.linalg.eigSym(m)
    // SVD semantics (Levy & Goldberg keep top SINGULAR values): order
    // by |λ| — PPMI spectra have large negative tails, and for a
    // symmetric matrix σ_k = |λ_k|. Ties: positive first, then index.
    val order = ids.indices.sortBy(i =>
      (-math.abs(es.eigenvalues(i)), -es.eigenvalues(i)))
    val rows = order.take(dim).map { e =>
      val row = Array.tabulate(ids.length)(c => es.eigenvectors(c, e))
      val jmax = row.indices.maxBy(j => (math.abs(row(j)), -j))
      val flip = if (row(jmax) < 0) -1.0 else 1.0
      row.map(x => math.round(x * flip * 1e6))
    }
    EmbedModel(ids,
      Array.tabulate(ids.length)(c => Array.tabulate(dim)(k => rows(k)(c))),
      order.map(es.eigenvalues(_)).toArray)
  }

  /** Distributed eigenbasis past the [[train]] cap: block orthogonal
    * iteration (Golub & Van Loan §8.2, public knowledge) where NOTHING
    * driver-side exceeds dim×dim.
    *
    * Per round: `Y = M·Q` is one join + sum groupBy over nnz×dim
    * rows; orthonormalization avoids any tall QR by the Gram trick —
    * `G = YᵀY` (a dim×dim aggregation, the [[graft.pipeline.Pca]]
    * moment pattern), Cholesky `G = L·Lᵀ` on the driver, and
    * `Q ← Y·L⁻ᵀ` as a broadcast dim×dim matvec per row. The basis Q
    * lives ONLY as a DataFrame — vocabulary size never touches the
    * driver, so this is the 100 TB path (and why it exists: [[train]]
    * fails loudly at `maxNodes`).
    *
    * Determinism caveat, by design: double sums through an exchange
    * are partition-order dependent, so this path is spec-pinned
    * (subspace-equal to [[train]] within tolerance — GraphEmbedSpec)
    * rather than hash-gated; the micro-int [[train]]+[[embeddings]]
    * pipeline remains the oracle surface. Returns the orthonormal
    * basis `(id, q: array<double>)` plus Rayleigh eigenvalue
    * estimates, descending.
    */
  def trainDistributed(ppmi: DataFrame, dim: Int, iters: Int = 15)
      : (DataFrame, Array[Double]) = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val m = ppmi.select(col("center"), col("context"),
      (col("ppmi_micro").cast("double") / 1e6).as("m")).localCheckpoint()

    // deterministic pseudo-random init in [-1, 1): md5-derived, so
    // restarts converge to the same basis up to float noise
    val ids = m.select(col("center").as("id")).distinct()
    var q = ids.select(col("id"), array((1 to dim).map { k =>
      (graft.pipeline.TextOps.hash32(k, col("id").cast("string")).cast("double") /
        lit(2147483648.0)).as(s"q$k")
    }: _*).as("q")).localCheckpoint()

    def orthonormalize(y: DataFrame): DataFrame = {
      // G = YᵀY via upper-triangle products, dim(dim+1)/2 result rows
      val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
        transform(sequence(i, lit(dim - 1)), j =>
          struct(i.as("i"), j.as("j"),
            (element_at(col("q"), i + 1) * element_at(col("q"), j + 1)).as("xy")))))
      val g = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      y.select(explode(pairs).as("p"))
        .groupBy(col("p.i"), col("p.j")).agg(sum(col("p.xy")).as("s"))
        .collect().foreach { r =>
          g(r.getInt(0), r.getInt(1)) = r.getDouble(2)
          g(r.getInt(1), r.getInt(0)) = r.getDouble(2)
        }
      val lInv = breeze.linalg.inv(breeze.linalg.cholesky(g)) // Q = Y·L⁻ᵀ
      val qNext = array((0 until dim).map { k =>
        (0 to k).map(j => element_at(col("q"), j + 1) * lit(lInv(k, j)))
          .reduce(_ + _).as(s"q${k + 1}")
      }: _*)
      y.select(col("id"), qNext.as("q"))
    }

    def mulM(qDf: DataFrame): DataFrame = {
      val qx = qDf.select(col("id").as("context"), posexplode(col("q")).as(Seq("k", "qv")))
      m.join(qx, Seq("context"))
        .groupBy(col("center"), col("k"))
        .agg(sum(col("m") * col("qv")).as("yv"))
        .groupBy(col("center"))
        .agg(array_sort(collect_list(struct(col("k"), col("yv")))).as("kv"))
        .select(col("center").as("id"),
          transform(col("kv"), s => s.getField("yv")).as("q"))
    }

    q = orthonormalize(q)
    for (_ <- 1 to iters)
      q = orthonormalize(mulM(q)).localCheckpoint()

    // Rayleigh estimates diag(Qᵀ M Q): one more multiply, one sum
    val z = mulM(q)
    val eigs = q.join(z.withColumnRenamed("q", "z"), Seq("id"))
      .select(posexplode(zip_with(col("q"), col("z"), (a, b) => a * b)).as(Seq("k", "qz")))
      .groupBy(col("k")).agg(sum(col("qz")).as("lam"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    (q, eigs)
  }

  /** Distributed spectral embedding: one broadcast of the V×dim
    * micro-int projection, one join on context, one integer-sum
    * groupBy — `(id, dim, emb_micro)` rows with dim 1-based. Unit is
    * 1e-12 (ppmi micro × projection micro).
    */
  def embeddings(ppmi: DataFrame, model: EmbedModel): DataFrame = {
    val spark = ppmi.sparkSession
    import spark.implicits._
    val vRows = for {
      i <- model.contexts.indices
      k <- 0 until model.dim
    } yield (model.contexts(i), (k + 1).toLong, model.vMicro(i)(k))
    val vdf = vRows.toDF("context", "dim", "v_micro")
    ppmi.join(broadcast(vdf), Seq("context"))
      .groupBy(col("center"), col("dim"))
      .agg(sum(col("ppmi_micro") * col("v_micro")).as("emb_micro"))
      .select(col("center").as("id"), col("dim"), col("emb_micro"))
  }
}

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
  *     need a distributed orthogonal-iteration variant, out of scope
  *     while every caller is node-typed), `eigSym`, keep the top-dim
  *     eigenvectors with canonical signs (largest-|component|
  *     positive, ties to the lowest index — the [[graft.pipeline.Pca]]
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
    * eigenvalues descending, all of them (variance accounting).
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
    val order = ids.indices.sortBy(i => -es.eigenvalues(i))
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

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data SELECTION over the documents corpus — the step after
  * dedup/quality where a pipeline decides WHICH surviving documents
  * feed the model. Two classic selectors, both engineered to the
  * engine's cross-engine exactness discipline (micro-int scores, no
  * transcendental on the compare path that isn't 6dp-rounded per row
  * before any aggregation):
  *
  *  - [[dsir]] — Data Selection via Importance Resampling (Xie et
  *    al., NeurIPS'23): hashed n-gram bucket counts, per-bucket
  *    log importance ratios between a target and a raw distribution,
  *    per-document integer weight sums, global top-permille keep.
  *  - [[mooreLewis]] — cross-entropy difference selection (Moore &
  *    Lewis, ACL'10): per-token NLL under an in-domain LM minus NLL
  *    under a general LM; keep documents the in-domain model likes
  *    MORE than the general one.
  *
  * Reference surface: selection is beyond HGraphStorage itself (it is
  * the LLM-pipeline tier the engine adds); the traversal analog of
  * "filter by a scored predicate" is Query.hs:23's rsTgtFilter.
  */
object Select {

  /** Uniform 32-bit bucket of a text feature: first md5 word mod
    * `buckets` — the same md5-derived keying every dedup/band family
    * member uses (uniform, skew-free, and expressible identically in
    * DuckDB as `CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) % B`).
    */
  def featureBucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % buckets

  /** (id, bucket) stream of hashed unigram + bigram features — the
    * DSIR feature map. Zero shuffle: tokens posexplode in-row and the
    * bigram context is an element_at lookup.
    */
  private def gramBuckets(df: DataFrame, idCol: String, text: Column,
      buckets: Int): DataFrame = {
    // deliberately NOT spread (r16, measured): repartitioning the text
    // ahead of the gram explode blew executor time up ~10× — the
    // uni+bi unionAll below evaluates this subtree TWICE, so a spread
    // here ships the full text through an exchange twice and re-runs
    // the explode on both branches; fused into the scan, the double
    // evaluation is nearly free (q_select_dsir 3.1 s → 4.1 s with the
    // spread, reverted)
    val tr = TextOps.positionedTokens(df, idCol, text)
    val uni = tr.select(col(idCol), col("w").as("g"))
    val bi = tr.filter(col("pos") >= 1)
      .select(col(idCol), concat(col("w1"), lit(" "), col("w")).as("g"))
    uni.unionAll(bi).select(col(idCol), featureBucket(col("g"), buckets).as("bucket"))
  }

  /** DSIR importance scores + top-permille selection.
    *
    * Weights: for each of `buckets` hashed-ngram buckets f,
    * `w_f = ln( ((ct_f+1)·(Nr+B)) / ((cr_f+1)·(Nt+B)) )` — the
    * add-one-smoothed log ratio of target to raw feature mass —
    * rounded to 6dp and scaled to micro-nats PER BUCKET, so the
    * per-document score `Σ_f c_doc(f)·w_f` is a pure BIGINT sum
    * (order-free, hash-exact cross-engine). All products stay under
    * 2^53, so the double ratio has one rounding each side.
    *
    * Selection: global rank by (score desc, id asc) via the two-phase
    * [[graft.operators.Skew.globalRank]] — no SinglePartition window —
    * and `selected = rank <= (keepPermille·N + 999) DIV 1000` (the
    * integer order-statistic arithmetic; a double `ceil(0.25·N)` is
    * off-by-one at exact multiples).
    *
    * 100 TB shape: the weight table is exactly `buckets` rows and
    * rides a broadcast; candidate scoring is one scan + one
    * (id, bucket) count + one groupBy(id); the target/raw count
    * aggregations are each one pass over their corpus.
    */
  def dsir(target: DataFrame, raw: DataFrame, candidates: DataFrame,
      idCol: String, text: Column, buckets: Int = 64,
      keepPermille: Int = 250): DataFrame = {
    require(buckets > 0 && keepPermille >= 0 && keepPermille <= 1000,
      s"bad dsir params: buckets=$buckets keepPermille=$keepPermille")
    val spark = target.sparkSession
    val tg = gramBuckets(target, idCol, text, buckets)
    val rg = gramBuckets(raw, idCol, text, buckets)
    val tc = tg.groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val rc = rg.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tots = tg.agg(count(lit(1)).as("nt")).crossJoin(rg.agg(count(lit(1)).as("nr")))
    val dom = spark.range(buckets).select(col("id").as("bucket"))
    val b = lit(buckets.toLong)
    // (ct+1)·(nr+B) and (cr+1)·(nt+B) are exact in LONG; the division
    // is the single rounding before ln — mirrored verbatim in SQL
    val ratio = ((coalesce(col("ct"), lit(0L)) + 1L) * (col("nr") + b)).cast("double") /
      (((coalesce(col("cr"), lit(0L)) + 1L) * (col("nt") + b)).cast("double"))
    val weights = dom
      .join(tc, Seq("bucket"), "left")
      .join(rc, Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        round(round(log(ratio), 6) * 1000000, 0).cast("long").as("w_micro"))
    val cg = gramBuckets(candidates, idCol, text, buckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val scored = cg.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_grams"),
        sum(col("cnt") * col("w_micro")).as("dsir_micro"))
    val ranked = graft.operators.Skew.globalRank(scored,
      Seq((-col("dsir_micro")).as("__negs"), col(idCol)), "rnk")
    val nDf = scored.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(nDf))
      .select(col(idCol), col("n_grams"), col("dsir_micro"), col("rnk"),
        when(col("rnk") <= expr(s"($keepPermille * __n + 999) DIV 1000"), 1L)
          .otherwise(0L).as("selected"))
  }

  /** Moore-Lewis cross-entropy difference selection: per-token NLL of
    * each candidate under the in-domain LM minus under the general LM
    * (both stupid-backoff trigram LMs, [[TextOps.stupidBackoffLogProb]]),
    * in micro-nats. `selected = ml_micro <= 0` — the in-domain model
    * assigns the document LOWER per-token surprise than the general
    * one (the paper's threshold-at-zero form).
    *
    * Exactness: both NLLs use the LM family's per-token 6dp micro-nat
    * rounding before the per-doc integer sum, and the per-token
    * reduction is the same `floor(-sum/n)` integer expression the
    * CCNet filter gates on, so the difference is BIGINT arithmetic.
    *
    * 100 TB shape: two LM trainings (each three count aggregations
    * over the training slice) + two scoring passes over candidates
    * (narrow count joins keyed by hash-uniform text tokens), then one
    * (id ⋈ id) join of two doc-keyed frames.
    */
  def mooreLewis(inDomain: DataFrame, general: DataFrame,
      candidates: DataFrame, idCol: String, text: Column): DataFrame = {
    val perTok = (scored: DataFrame, out: String) => scored.select(
      col(idCol), col("n_tokens"),
      floor((-col("sum_lp_micro")).cast("double") / col("n_tokens").cast("double"))
        .cast("long").as(out))
    val t = perTok(TextOps.stupidBackoffLogProb(inDomain, candidates, idCol, text),
      "nll_in_micro")
    val g = perTok(TextOps.stupidBackoffLogProb(general, candidates, idCol, text),
      "nll_gen_micro").drop("n_tokens")
    t.join(g, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("nll_in_micro"), col("nll_gen_micro"),
        (col("nll_in_micro") - col("nll_gen_micro")).as("ml_micro"),
        when(col("nll_in_micro") - col("nll_gen_micro") <= 0L, 1L)
          .otherwise(0L).as("selected"))
  }
}

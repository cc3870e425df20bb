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
    val q = typedLit(query)
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

  /** LSH bucket id: bit p = (v · plane_p > 0). Pure expression. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val signs = typedLit((0 until dim).map(d => planeSign(p, d).toDouble))
      when(dot(vec, signs) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: search only the query's bucket. Falls back to the
    * whole corpus when the bucket has fewer than k members is NOT
    * done here — multi-probe (flipping low-margin bits) is the
    * production extension; this returns the single-bucket answer.
    */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, planes: Int = 8): DataFrame = {
    val dim = query.length
    val qBucket: Long = (0 until planes).map { p =>
      val d = (0 until dim).map(i => query(i).toDouble * planeSign(p, i)).sum
      if (d > 0) 1L << p else 0L
    }.sum
    topK(embeddings.filter(lshBucket(col(vecCol), planes, dim) === qBucket),
      idCol, vecCol, query, k)
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — designed shuffle-aware:
  *
  *  - signatures (minhash arrays, simhash ints) are pure per-row
  *    expressions — no shuffle, full codegen, scan-speed at 100 TB;
  *  - the only shuffles are the LSH band groupBy (keys are hashes →
  *    uniformly distributed, no skew) and the candidate-pair join
  *    (bounded by bucket sizes, NOT by corpus size²);
  *  - the naive all-pairs join exists only as `ngramJaccardPairs`
  *    for oracle-checkable verification at small SF — the scale path
  *    is always LSH → verify candidates.
  */
object Dedup {

  /** Exact duplicates by content hash. */
  def exactDuplicates(df: DataFrame, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .filter(col("n") > 1)

  /** MinHash signature: sig[j] = min over shingles of hash32(j, s).
    * One array column, `numHashes` array_min(transform(...)) exprs —
    * zero shuffles.
    */
  def minhashSig(text: Column, numHashes: Int, shingleN: Int = 3): Column = {
    val sh = TextOps.shingles(text, shingleN)
    array((0 until numHashes).map(j => array_min(transform(sh, s => TextOps.hash32(j, s)))): _*)
  }

  /** LSH band keys: md5 over each band's slice of the signature.
    * bands*rows must equal the signature length.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws(",", lit(b.toString) +: (0 until rows).map(r => sig.getItem(b * rows + r).cast("string")): _*))
    }: _*)

  /** Candidate near-duplicate pairs via MinHash-LSH: docs sharing at
    * least one band bucket. Output: (da, db) with da < db, distinct.
    */
  def lshCandidates(df: DataFrame, idCol: String, text: Column,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val keyed = df.select(col(idCol).as("id"),
      explode(bandKeys(minhashSig(text, numHashes, shingleN), bands, rows)).as("band"))
    val a = keyed.select(col("band"), col("id").as("da"))
    val b = keyed.select(col("band"), col("id").as("db"))
    a.join(b, Seq("band")).filter(col("da") < col("db")).select("da", "db").distinct()
  }

  /** Verified near-dup pairs: LSH candidates re-checked with true
    * shingle Jaccard >= threshold. The verify join carries shingle
    * sets only for candidate ids (semi-joined), not the whole corpus.
    */
  def nearDuplicates(df: DataFrame, idCol: String, text: Column,
      threshold: Double, numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val cand = lshCandidates(df, idCol, text, numHashes, bands, shingleN)
    val sh = df.select(col(idCol).as("id"), TextOps.shingles(text, shingleN).as("sh"))
    cand
      .join(sh.withColumnRenamed("id", "da").withColumnRenamed("sh", "sha"), Seq("da"))
      .join(sh.withColumnRenamed("id", "db").withColumnRenamed("sh", "shb"), Seq("db"))
      .withColumn("jac",
        round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 4))
      .filter(col("jac") >= threshold)
      .select(col("da"), col("db"), col("jac"))
  }

  /** SimHash (16-bit): bit i set iff tokens whose hash has bit i
    * outnumber those without. Pure expression, no shuffle.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    val ts = TextOps.tokens(text)
    val n  = size(ts)
    (0 until bits).map { i =>
      val ones = size(filter(ts, t => shiftright(TextOps.hash32(0, t), i) % 2 === 1))
      when(ones * 2 > n, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exhaustive n-gram Jaccard pairs — O(pairs sharing a shingle);
    * verification-grade, small-SF only. The scale path is
    * [[nearDuplicates]].
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, text: Column,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), explode(TextOps.shingles(text, shingleN)).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("s"), col("id").as("da"))
      .join(sh.select(col("s"), col("id").as("db")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "da").withColumnRenamed("n", "na"), Seq("da"))
      .join(sizes.withColumnRenamed("id", "db").withColumnRenamed("n", "nb"), Seq("db"))
      .withColumn("jac", round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jac") >= threshold)
      .select(col("da"), col("db"), col("jac"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (rolling-hash CDC — the Rabin-style
  * boundary scheme behind LBFS/rsync-class dedup; public knowledge).
  * A position is a chunk boundary when the polynomial hash of the
  * last [[W]] characters hits 0 mod the target chunk size, so
  * boundaries are a function of LOCAL content only: insert or delete
  * text anywhere and every boundary more than one window past the
  * edit stays put — fixed-size chunking re-shifts everything, CDC
  * re-chunks only the edited neighborhood (shift resistance is
  * spec-pinned, and the cross-doc sharing gate is the payoff:
  * identical phrases in different documents yield identical chunk
  * hashes).
  *
  * This is the BASIC stateless scheme: no min/max chunk clamps —
  * those make each boundary depend on the previous one (a sequential
  * scan), where the stateless predicate is embarrassingly parallel:
  * every position evaluates one 8-term integer polynomial at scan
  * speed, and the only non-map work is a doc-partitioned window to
  * number the chunks. Exact integer arithmetic end-to-end, so the
  * DuckDB oracle re-derives every boundary bit-for-bit.
  */
object Cdc {

  /** Rolling window width (chars) and polynomial base/modulus. */
  val W = 8
  val Base = 31L
  val Mod: Long = 1L << 20

  private val pows: Seq[Long] =
    Iterator.iterate(1L)(_ * Base).take(W).toSeq

  /** Hash of the window ending at 1-based char position `i` (i >= W):
    * sum of ascii(char at i-j) * Base^j, mod [[Mod]]. Longs
    * throughout — the largest term is 127 * 31^7 < 2^42.
    */
  def boundaryHash(text: Column, i: Column): Column =
    pows.zipWithIndex.map { case (p, j) =>
      ascii(text.substr(i - j, lit(1))).cast("long") * p
    }.reduce(_ + _) % Mod

  /** Chunk every document: returns (idCol, chunk_idx, start, n_chars,
    * chunk_md5) with 1-based char offsets; `avgChunk` is the expected
    * chunk length (boundary probability 1/avgChunk per position). The
    * end of each document is always a boundary, so chunks tile the
    * text exactly.
    */
  def chunks(docs: DataFrame, idCol: String, text: Column, avgChunk: Int): DataFrame = {
    require(avgChunk >= 1, s"avgChunk must be >= 1, got $avgChunk")
    val d = docs.select(col(idCol), text.as("__t")).where(length(col("__t")) > 0)
    val pos = d.select(col(idCol), col("__t"),
      explode(when(length(col("__t")) >= W, sequence(lit(W), length(col("__t"))))
        .otherwise(array().cast("array<int>"))).as("i"))
    val bnd = pos.filter(boundaryHash(col("__t"), col("i")) % avgChunk === 0)
      .select(col(idCol), col("i"))
    val ebnd = bnd
      .unionByName(d.select(col(idCol), length(col("__t")).as("i")))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("i"))
    ebnd
      .withColumn("s", coalesce(lag(col("i"), 1).over(w), lit(0)) + 1)
      .withColumn("chunk_idx", row_number().over(w))
      .join(d, Seq(idCol))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("s").cast("long").as("start"),
        (col("i") - col("s") + 1).cast("long").as("n_chars"),
        md5(col("__t").substr(col("s"), col("i") - col("s") + 1)).as("chunk_md5"))
  }

  /** Cross-document chunk-level exact dedup: chunks whose content
    * occurs more than once in the corpus, with copy and document
    * counts — the sub-document sharing CDC boundaries exist to
    * expose. One groupBy on the (short) chunk hash.
    */
  def sharedChunks(docs: DataFrame, idCol: String, text: Column,
      avgChunk: Int): DataFrame =
    chunks(docs, idCol, text, avgChunk)
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_copies") >= 2)
}

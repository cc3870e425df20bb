package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketching for corpus-scale counting.
  *
  * Count-min sketch, built deterministically: row `j` of the sketch
  * hashes an item with [[TextOps.hash32]] seeded by `j` (one md5 per
  * (item, row) — reproducible in any engine) into `width` buckets and
  * sums occurrences; a point estimate is the MIN over rows of the
  * item's bucket counts — an upper bound on the true frequency that
  * overcounts only on bucket collisions, with error ≤ 2N/width at
  * probability 1 - 2^-depth.
  *
  * The sketch is `depth × width` rows regardless of corpus size: the
  * groupBy keys are hash-uniform (no skew), the result broadcasts
  * anywhere, and merging sketches of two corpora is elementwise
  * addition (same groupBy) — the properties that make it the
  * 100 TB substitute for exact per-item counts.
  */
object Sketch {

  /** Build: one row per (sketch row j, bucket) with summed counts.
    * `items` = one row per occurrence (pre-exploded).
    */
  def countMin(items: DataFrame, item: Column, depth: Int = 4, width: Int = 1024): DataFrame =
    (0 until depth).map { j =>
      items.groupBy((TextOps.hash32(j, item) % width).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(lit(j).as("j"), col("bucket"), col("n"))
    }.reduce(_ unionAll _)

  /** Point estimates for `queries` (a frame with distinct `item`
    * values): min over sketch rows of the hashed bucket's count.
    * Items absent from the corpus estimate 0 only if their buckets
    * are empty — the usual CMS upper-bound caveat.
    */
  def estimate(sketch: DataFrame, queries: DataFrame, item: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val hashed = queries.select(item.as("item"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), (TextOps.hash32(j, item) % width).as("bucket"))): _*)).as("h"))
      .select(col("item"), col("h.j").as("j"), col("h.bucket").as("bucket"))
    hashed.join(sketch, Seq("j", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}

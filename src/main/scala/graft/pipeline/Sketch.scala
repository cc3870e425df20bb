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

  /** HyperLogLog registers, built deterministically: the 32-bit
    * md5-derived [[TextOps.hash32]] splits into a `b`-bit bucket (top
    * bits) and a (32-b)-bit suffix whose leading-zero rank the
    * register keeps the max of. The register table is at most 2^b
    * rows whatever the corpus size, merging two corpora's registers
    * is an elementwise max (same groupBy), and — like the count-min
    * sketch — every step is plain integer/string arithmetic both
    * engines replay exactly (`bin` + `ltrim` give the bit length;
    * no log2 rounding hazards).
    */
  def hllRegisters(items: DataFrame, item: Column, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, s"HLL precision b=$b outside [4,16]")
    val rest = 32 - b
    val h = TextOps.hash32(0, item)
    val w = h % (1L << rest)
    // rank = leading zeros of the rest-bit suffix + 1
    //      = (rest + 1) - bitlength(w); w = 0 -> rest + 1
    val rank = (lit(rest + 1) - length(ltrim(bin(w), "0"))).cast("long")
    items.select(shiftright(h, rest).cast("long").as("bucket"), rank.as("rank"))
      .groupBy(col("bucket")).agg(max(col("rank")).as("max_rank"))
  }

  /** Raw HLL estimate from a register table:
    * `alpha_m * m^2 / sum_m(2^-rank)` with absent registers counting
    * rank 0 (2^0 = 1 each). Every 2^-rank term is a power of two
    * >= 2^-(33-b), so the double sum is EXACT regardless of
    * summation order — the estimate is engine-deterministic, unlike
    * a general double sum. No small-range linear-counting correction
    * (it needs ln, whose last bit differs across libm builds); for
    * cardinalities below 2.5m use the exact distinct count instead.
    */
  def hllEstimate(registers: DataFrame, b: Int = 6): DataFrame = {
    val m = 1 << b
    registers.agg(
      sum(pow(lit(2.0), -col("max_rank"))).as("z"),
      count(lit(1)).as("nz"))
      .select((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m)) * m * m /
        (col("z") + (lit(m) - col("nz")))).as("est"))
  }

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

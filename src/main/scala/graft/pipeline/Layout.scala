package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering with a
  * partition-prunable prefix, so range predicates on ANY of the
  * clustered dimensions skip most of the data — the multi-column
  * analog of the single-key clustering the reference gets from its
  * B-tree-ordered storage (HGraphStorage keeps records clustered by
  * object id only; a filter on any OTHER attribute scans everything —
  * src/Database/Graph/HGraphStorage/API.hs `filterObjects`).
  *
  * Shape (the public Delta/Iceberg OPTIMIZE ZORDER idea, re-expressed
  * with plain Spark primitives):
  *  - each dimension is bucketed into 2^bits quantile buckets; the
  *    boundaries come from ONE `approxQuantile` pass (sampled sketch,
  *    driver gets `dims × (2^bits - 1)` doubles — skew-robust where
  *    min/max linear bucketing is not);
  *  - bucket codes interleave bit-by-bit into the Morton value `z`
  *    (a pure codegen'd shift/or expression — no UDF);
  *  - the TOP `prefixBits` of z become the directory partition key
  *    `zp`; files are written one-per-partition sorted by full z, so
  *    a probe prunes directories via `zp IN (...)` (a real
  *    PartitionFilter — LayoutSpec pins selectedPartitions) and
  *    row-groups via the parquet min/max on z inside each file.
  *
  * 100 TB notes: the write is one repartition keyed by zp (a single
  * shuffle, same cost class as any clustering rewrite); probes list
  * only the qualifying `zp=` directories, so scan cost tracks the
  * query rectangle's volume, not the table size. The zp enumeration
  * is driver-side over bucket COMBINATIONS of the probed rectangle,
  * capped (a rectangle spanning most buckets degenerates to a full
  * scan — exactly when pruning could not have helped anyway).
  */
object Layout {

  /** Per-dimension quantile boundaries (2^bits - 1 splits each) from
    * one approxQuantile pass. relativeError 1e-3 keeps the sketch
    * small; layout quality degrades gracefully with sketch error,
    * correctness never depends on it.
    */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int): Seq[Array[Double]] = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    cols.map(c => df.stat.approxQuantile(c, probs, 1e-3))
  }

  /** Bucket index of `c` in `bnds` (count of boundaries ≤ value):
    * a fixed cascade of comparisons — codegen-friendly, no UDF.
    */
  def bucketOf(c: Column, bnds: Array[Double]): Column =
    bnds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c >= lit(b), lit(1)).otherwise(lit(0))
    }

  /** Morton value: interleave the `bits`-wide bucket codes of each
    * dimension (dimension 0 owns the lowest bit of each group).
    */
  def zValue(cols: Seq[Column], bnds: Seq[Array[Double]], bits: Int): Column = {
    require(cols.size == bnds.size, "one boundary set per dimension")
    val d = cols.size
    val buckets = cols.zip(bnds).map { case (c, b) => bucketOf(c, b).cast("long") }
    val terms = for {
      i <- 0 until bits
      j <- 0 until d
    } yield shiftleft(shiftright(buckets(j), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** A z-ordered layout's driver-side geometry (tiny: `dims × 2^bits`
    * doubles). Persist via [[graft.core.Sidecar]] if the layout
    * outlives the session; the gate derives it per run.
    */
  final case class ZLayout(cols: Seq[String], bnds: Seq[Array[Double]],
      bits: Int, prefixBits: Int) {
    require(prefixBits > 0 && prefixBits <= bits * cols.size,
      s"prefixBits must be in [1, ${bits * cols.size}]")
    def z: Column = zValue(cols.map(col), bnds, bits)
    def zp: Column = shiftright(z, bits * cols.size - prefixBits)
  }

  /** Write `df` z-ordered by `layout` under `path`: one shuffle keyed
    * by the zp directory, rows sorted by full z inside each file (the
    * parquet min/max zone maps then slice WITHIN a directory too).
    */
  def writeZOrdered(df: DataFrame, path: String, layout: ZLayout): Unit =
    df.withColumn("z", layout.z)
      .withColumn("zp", layout.zp)
      .repartition(col("zp"))
      .sortWithinPartitions(col("zp"), col("z"))
      .write.mode("overwrite").partitionBy("zp").parquet(path)

  /** The `zp` directories a rectangle query can touch: enumerate the
    * bucket boxes of the rectangle (driver-side, bounded by
    * `maxCombos`), take each box's z-prefix. Returns None when the
    * rectangle spans too many boxes — the caller scans unpruned
    * (pruning would not have paid there anyway).
    */
  def probePrefixes(layout: ZLayout, ranges: Seq[(Double, Double)],
      maxCombos: Int = 1 << 16): Option[Seq[Long]] = {
    require(ranges.size == layout.cols.size, "one range per dimension")
    val d = layout.cols.size
    // bucket span of [lo, hi] in dim j: boundaries are sorted, bucket
    // = count of boundaries <= value (same arithmetic as bucketOf)
    def bucket(b: Array[Double], x: Double): Int = b.count(x >= _)
    val spans = layout.bnds.zip(ranges).map { case (b, (lo, hi)) =>
      bucket(b, lo) to bucket(b, hi)
    }
    val nCombos = spans.map(_.size.toLong).product
    if (nCombos > maxCombos) None
    else {
      def zOf(bucketIdx: Seq[Int]): Long = {
        var z = 0L
        for (i <- 0 until layout.bits; j <- 0 until d)
          z |= ((bucketIdx(j).toLong >> i) & 1L) << (i * d + j)
        z
      }
      val combos = spans.foldLeft(Seq(Seq.empty[Int])) { (acc, s) =>
        acc.flatMap(pfx => s.map(pfx :+ _))
      }
      val shift = layout.bits * d - layout.prefixBits
      Some(combos.map(c => zOf(c) >> shift).distinct.sorted)
    }
  }

  /** Probe a z-ordered layout with a rectangle: zp pruning (when the
    * box enumeration is bounded) + the exact residual predicate. The
    * result set is EXACTLY the rectangle regardless of layout,
    * boundaries, or sketch error — pruning only skips directories
    * that cannot contain matches.
    */
  def probe(spark: SparkSession, path: String, layout: ZLayout,
      ranges: Seq[(Double, Double)]): DataFrame = {
    val df = spark.read.parquet(path)
    val residual = layout.cols.zip(ranges)
      .map { case (c, (lo, hi)) => col(c) >= lit(lo) && col(c) <= lit(hi) }
      .reduce(_ && _)
    probePrefixes(layout, ranges) match {
      case Some(zps) => df.filter(col("zp").isin(zps: _*)).filter(residual)
      case None => df.filter(residual)
    }
  }
}

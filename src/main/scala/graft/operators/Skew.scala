package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew levers for hot keys (SCALE.md): the per-group newest-first
  * limit is the engine's main skew exposure (a celebrity node with
  * 10^8 edges lands its whole window partition on one task). The
  * salted form runs top-k twice: within (group, salt) — parallel
  * across salts — then across the k*salts survivors per group.
  * Result is identical to the plain window when the order column is
  * unique within each group.
  */
object Skew {

  def perGroupTopK(df: DataFrame, group: Column, order: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  def saltedPerGroupTopK(df: DataFrame, group: Column, order: Column, k: Int,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(order), lit(salts)))
    val w1 = Window.partitionBy(group, col("__salt")).orderBy(order.desc)
    val survivors = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    perGroupTopK(survivors, group, order, k)
  }

  /** Exact 1-based global rank over a strict total order — WITHOUT
    * the single-partition window that `row_number() OVER (ORDER BY …)`
    * plans (every row through one task: the canonical scale-killer,
    * and the shape behind "deterministic corpus shuffle" in training
    * pipelines, e.g. order by md5(doc)).
    *
    * Two-phase: range-partition + sort by the key, pin the placement
    * with an eager localCheckpoint (range bounds come from sampling,
    * so WITHOUT pinning the counting pass and the ranking pass could
    * draw different bounds and mismatch), count rows per partition
    * (driver-tiny: one row per partition), broadcast the cumulative
    * offsets back, and add them to the per-partition ranks. Every
    * window in the final plan partitions by `__pid` — no
    * SinglePartition exchange anywhere (ShuffleSpec-pinned).
    *
    * `key` must be a strict total order (include a unique tiebreaker):
    * equal keys could straddle a range boundary, and only strictness
    * makes rank placement-independent.
    */
  /** Exact per-group running (inclusive prefix) sum of `value` in
    * `ord` order — WITHOUT the per-group window that
    * `sum() OVER (PARTITION BY group ORDER BY …)` plans. A
    * partitioned window puts each group on ONE task, so with few
    * large groups (the training-mix shape: a handful of sources over
    * a 100 TB corpus) the whole corpus funnels through #groups tasks.
    *
    * Same two-phase shape as [[globalRank]]: range-partition by
    * (group, ord) — a group larger than one range splits across
    * consecutive partitions — pin placement with an eager
    * localCheckpoint, aggregate one (partition, group) subtotal row
    * each (driver-tiny: ≤ partitions × groups-per-partition-boundary
    * rows in the worst case, ~partitions + groups in practice since
    * ranges respect group prefix order), scan-prefix the offsets per
    * group on the driver, broadcast them back, and window by
    * (partition, group) — never by group alone.
    *
    * `ord` must be strict within each group (include a unique
    * tiebreaker). The group column must be string-typed (its values
    * round-trip through the driver).
    */
  def perGroupPrefixSum(df: DataFrame, group: Column, ord: Seq[Column],
      value: Column, cumCol: String = "cum"): DataFrame = {
    val pinned = df
      .withColumn("__grp", group).withColumn("__val", value.cast("long"))
      .repartitionByRange((col("__grp") +: ord): _*)
      .sortWithinPartitions((col("__grp") +: ord): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val sums = pinned.groupBy(col("__pid"), col("__grp"))
      .agg(sum(col("__val")).as("__s"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = sums.groupBy(_._2).iterator.flatMap { case (grp, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, grp, off) }
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__grp", "__off")
    val w = Window.partitionBy(col("__pid"), col("__grp")).orderBy(ord: _*)
    pinned.join(broadcast(offDf), Seq("__pid", "__grp"))
      .withColumn(cumCol, (sum(col("__val")).over(w) + col("__off")).cast("long"))
      .drop("__pid", "__grp", "__off", "__val")
  }

  def globalRank(df: DataFrame, key: Seq[Column], rankCol: String = "rnk"): DataFrame = {
    val pinned = df
      .repartitionByRange(key: _*)
      .sortWithinPartitions(key: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = pinned.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts).map {
      case (off, (pid, _)) => (pid, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(key: _*)
    pinned.join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankCol, (row_number().over(w) + col("__off")).cast("long"))
      .drop("__pid", "__off")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly —
  * composed from existing ops per the custom-operator preference
  * order (no new physical operator needed):
  *
  *  - **as-of join**: for each left row, the LATEST right row with
  *    `rightTs <= leftTs` per key. Implemented as union + one
  *    ordered window per key (`last(..., ignoreNulls)` over the
  *    merged timeline) — ONE shuffle total, versus the
  *    window-over-join blowup of the naive formulation. This is the
  *    standard log-merge shape: both sides sort once by
  *    (key, ts, side) and every left row picks up the running last
  *    right values.
  *
  *  - **range (interval) join**: pairs with
  *    `rightTs ∈ [leftTs + lower, leftTs + upper]`. Implemented by
  *    time-bin blocking: left rows replicate into the (≤ 2 when the
  *    bin width ≥ interval length) bins their window overlaps, the
  *    join runs on (keys, bin) — bounded fan-out, never key-only
  *    cross products — and the exact predicate filters after.
  */
object TemporalJoin {

  /** As-of join. `left`/`right` column names must be disjoint except
    * for `keys`, and may not use the internal names `__ts`, `__side`,
    * `__match` or `matched_<rightVal>` (checked). Output: every left
    * row + `matched_<c>` for each requested right column (null when no
    * right row precedes). All right values ride in ONE nullable struct
    * that is non-null exactly on right rows, so `last(ignoreNulls)`
    * tracks the latest right ROW — a right row whose value column is
    * genuinely NULL still supersedes an earlier non-null one.
    * Ties (several right rows at the same instant) resolve to the
    * window's last, deterministic given a deterministic right order.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "asOf needs at least one right value column")
    val reserved = Seq("__ts", "__side", "__match") ++ rightVals.map("matched_" + _)
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns collide with asOf internals: ${clash.mkString(", ")}")
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val matchStruct = struct(rightVals.map(c => col(c).as(c)): _*)
    val matchType = right.select(matchStruct.as("__match")).schema("__match").dataType
    val lFull = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__match", lit(null).cast(matchType))
    val rFull = leftOnly.foldLeft(
      right.select(keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"), matchStruct.as("__match")): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = keys ++ leftOnly ++ Seq("__ts", "__side", "__match")
    val merged = lFull.select(cols.map(col): _*).unionAll(rFull.select(cols.map(col): _*))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1): the
    // inclusive `rightTs <= leftTs` contract
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rightVals.foldLeft(
      merged.withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(s"matched_$c", col("__match").getField(c))
    }.drop("__ts", "__side", "__match")
  }

  /** Range join: all (left, right) pairs with
    * `rightTs - leftTs ∈ [lower, upper]` (seconds, `lower <= upper`).
    * Output: left columns + requested right columns.
    */
  def range(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lower: Long, upper: Long,
      rightVals: Seq[String]): DataFrame = {
    require(lower <= upper, s"empty interval [$lower, $upper]")
    val clash = (left.columns ++ right.columns).distinct.filter(_ == "__bin")
    require(clash.isEmpty, "input columns collide with range-join internal __bin")
    val w = math.max(upper - lower, 1L)
    val lBinned = left.withColumn("__bin",
      explode(sequence(expr(s"($leftTs + $lower) div $w"), expr(s"($leftTs + $upper) div $w"))))
    val rBinned = right
      .select(keys.map(col) ++ (rightTs +: rightVals).map(col): _*)
      .withColumn("__bin", expr(s"$rightTs div $w"))
    // each right row lives in exactly ONE bin, so every qualifying
    // (left, right) pair joins exactly once — no dedup needed even
    // though left rows replicate across bins
    lBinned.join(rBinned, keys :+ "__bin")
      .filter(col(rightTs).between(col(leftTs) + lower, col(leftTs) + upper))
      .drop("__bin")
  }
}

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
}

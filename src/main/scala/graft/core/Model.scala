package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The type-dictionary surface — the reference's "Model": bidirectional
  * name⇄id lookups for node types, edge types, and property types,
  * created lazily on first use (HGraphStorage Types.hs:335-355,
  * API.hs:471-490; STMGraph Raw.hs:352-367). Property types are
  * identified by (name, dataType) pairs — the same name with two
  * datatypes is two entries (Types.hs:338).
  *
  * In the Spark engine labels stay strings in the public API (parquet
  * dictionary-encodes them); the model table exists as queryable
  * metadata and broadcast-joinable dimension, derived from the
  * snapshot itself — so it can never drift from the data.
  */
object Model {

  /** Derive the model table from a snapshot: one row per (kind, name[,
    * dataType]), ids assigned by first-seen name order (dense ranks
    * over sorted names — deterministic).
    */
  def fromSnapshot(spark: SparkSession, g: GraphSnapshot): DataFrame = {
    val live = g.live
    // The unpartitioned window funnels the dictionary through one
    // partition — intentional: a dictionary is distinct labels/prop
    // names (dozens of rows by construction, never corpus-sized), and
    // global ids require a global order. The corpus-sized work
    // (distinct) happens BEFORE the window, fully parallel.
    def dict(kind: String, names: DataFrame): DataFrame =
      names.distinct()
        .withColumn("id", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("name"), col("dataType"))))
        .select(lit(kind).as("kind"), col("id"), col("name"), col("dataType"))

    val nodeTypes = dict("node", live.nodes.select(col("label").as("name"),
      lit(null).cast("byte").as("dataType")))
    val edgeTypes = dict("edge", live.edges.select(col("label").as("name"),
      lit(null).cast("byte").as("dataType")))
    // property types: every (name, vType) pair used anywhere
    def propTypes(df: DataFrame) = df
      .select(explode(col("props")).as(Seq("name", "vals")))
      .select(col("name"), explode(col("vals")).as("v"))
      .select(col("name"), col("v.vType").as("dataType"))
    val props = dict("prop", propTypes(live.nodes).unionAll(propTypes(live.edges)))
    nodeTypes.unionAll(edgeTypes).unionAll(props)
  }

  /** Persist / load the dictionary next to the snapshot tables
    * (readModel/writeModel, FileOps.hs:113-148).
    */
  def write(model: DataFrame, dir: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(s"$dir/model")

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/model")

  /** Driver-side name→id map for one kind (broadcast by callers). */
  def lookup(model: DataFrame, kind: String): Map[String, Int] =
    model.filter(col("kind") === kind).select("name", "id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
}

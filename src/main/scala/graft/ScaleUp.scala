package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local scale-stress generator: replicates an sf directory K times
  * with per-copy key offsets, preserving referential integrity (every
  * foreign key is shifted by the stride of the table it references).
  * Strides are data-derived (`max(key) + 1`), so copy keys stay far
  * below TpchGraph's 1e9 node-id bases at any K that fits on disk.
  *
  * Document text gets a per-copy token suffix: plain replication would
  * make every doc a 10-way exact duplicate, turning the dedup gate
  * queries into a quadratically DIFFERENT problem (giant LSH buckets)
  * rather than a 10x bigger one. Suffixed tokens keep each copy's
  * shingle space disjoint — the per-copy dedup structure is exactly
  * sf0.1's, replicated.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <copies>
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args
    val copies = copiesS.toInt
    val spark = graft.core.Graft.session("graft-scaleup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val t = graft.sources.Tables(spark, src)

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key)).cast("long")).head().getLong(0) + 1L

    val sReg  = stride(t.region, "r_regionkey")
    val sNat  = stride(t.nation, "n_nationkey")
    val sCust = stride(t.customer, "c_custkey")
    val sSupp = stride(t.supplier, "s_suppkey")
    val sPart = stride(t.part, "p_partkey")
    val sOrd  = stride(t.orders, "o_orderkey")
    val sEvt  = stride(t.events, "event_id")
    val sUser = stride(t.events, "user_id")
    val sDoc  = stride(t.documents, "doc_id")
    val sVec  = stride(t.embeddings, "vec_id")

    /** K copies with each key column shifted by i * its stride,
      * original column types preserved.
      */
    def rep(df: DataFrame, offsets: (String, Long)*): DataFrame =
      (0 until copies).map { i =>
        offsets.foldLeft(df) { case (d, (c, s)) =>
          val tpe = d.schema(c).dataType
          d.withColumn(c, (col(c) + lit(i * s)).cast(tpe))
        }
      }.reduce(_ unionByName _)

    def suffixTokens(df: DataFrame, textCol: String): DataFrame =
      (0 until copies).map { i =>
        val d = df.withColumn("doc_id", col("doc_id") + lit(i * sDoc))
        if (i == 0) d
        else d.withColumn(textCol,
          array_join(transform(split(col(textCol), " "), x => concat(x, lit(s"_$i"))), " "))
      }.reduce(_ unionByName _)

    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    w(rep(t.region, "r_regionkey" -> sReg), "region")
    w(rep(t.nation, "n_nationkey" -> sNat, "n_regionkey" -> sReg), "nation")
    w(rep(t.customer, "c_custkey" -> sCust, "c_nationkey" -> sNat), "customer")
    w(rep(t.supplier, "s_suppkey" -> sSupp, "s_nationkey" -> sNat), "supplier")
    w(rep(t.part, "p_partkey" -> sPart), "part")
    w(rep(t.orders, "o_orderkey" -> sOrd, "o_custkey" -> sCust), "orders")
    w(rep(t.lineitem, "l_orderkey" -> sOrd, "l_partkey" -> sPart, "l_suppkey" -> sSupp),
      "lineitem")
    w(rep(t.events, "event_id" -> sEvt, "user_id" -> sUser), "events")
    w(suffixTokens(t.documents, "text"), "documents")
    w(rep(t.embeddings, "vec_id" -> sVec), "embeddings")

    println(s"""{"scaled": "$src", "out": "$out", "copies": $copies}""")
    spark.stop()
  }
}

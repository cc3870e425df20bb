package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PropValues._
import graft.sources.Tables

/** Deterministic property-graph view over the driver's TPC-H-ish
  * tables (TESTDATA.md) — the correctness-gate graph: every node/edge
  * derives from a table row by pure arithmetic, so any traversal
  * result is independently expressible as DuckDB SQL over the same
  * parquet.
  *
  * ID scheme (disjoint spaces, stable under scale-up):
  *   node id  = KIND_BASE + natural key
  *   edge id  = LABEL_BASE + natural key (lineitem edges get
  *              orderkey*8 + linenumber: l_linenumber <= 7 in TPC-H)
  *
  * The graph shape mirrors the reference's Hackage benchmark graph
  * (Package -[versions]-> Version -[depends]-> Package,
  * HGraphStorage perf/HackageTest.hs:123-147): a fact-to-dimension
  * star re-expressed as labeled nodes and edges.
  */
object TpchGraph {
  // node id bases
  val CUST   = 1000000000L
  val NATION = 2000000000L
  val SUPP   = 3000000000L
  val ORDER  = 4000000000L
  val PART   = 5000000000L
  val REGION = 6000000000L

  // edge id bases (disjoint from nodes and each other)
  val E_PLACED    = 10000000000L // customer -> order,   id = base + o_orderkey
  val E_CUST_NAT  = 20000000000L // customer -> nation,  id = base + c_custkey
  val E_SUPP_NAT  = 30000000000L // supplier -> nation,  id = base + s_suppkey
  val E_CONTAINS  = 40000000000L // order -> part,       id = base + orderkey*8 + linenumber
  val E_SUPPLIES  = 50000000000L // supplier -> part,    id = base + orderkey*8 + linenumber
  val E_NAT_REG   = 60000000000L // nation -> region,    id = base + n_nationkey

  private def node(df: DataFrame, idCol: org.apache.spark.sql.Column, label: String,
      props: org.apache.spark.sql.Column): DataFrame =
    df.select(
      idCol.cast("long").as("id"),
      lit(label).as("label"),
      props.as("props"),
      lit(0L).as("tx_min"),
      lit(null).cast("long").as("tx_max"))

  def nodes(t: Tables): DataFrame = {
    val c = node(t.customer, col("c_custkey") + CUST, "customer",
      propsMap("name" -> pvText(col("c_name")), "mktsegment" -> pvText(col("c_mktsegment")),
        "acctbal" -> pvText(col("c_acctbal").cast("decimal(12,2)").cast("string"))))
    val n = node(t.nation, col("n_nationkey") + NATION, "nation",
      propsMap("name" -> pvText(col("n_name"))))
    val s = node(t.supplier, col("s_suppkey") + SUPP, "supplier",
      propsMap("name" -> pvText(col("s_name"))))
    val o = node(t.orders, col("o_orderkey") + ORDER, "order",
      propsMap("status" -> pvText(col("o_orderstatus")),
        "priority" -> pvText(col("o_orderpriority"))))
    val p = node(t.part, col("p_partkey") + PART, "part",
      propsMap("name" -> pvText(col("p_name")), "brand" -> pvText(col("p_brand"))))
    val r = node(t.region, col("r_regionkey") + REGION, "region",
      propsMap("name" -> pvText(col("r_name"))))
    c.unionAll(n).unionAll(s).unionAll(o).unionAll(p).unionAll(r)
  }

  private def edge(df: DataFrame, idc: org.apache.spark.sql.Column,
      src: org.apache.spark.sql.Column, srcLabel: String,
      dst: org.apache.spark.sql.Column, dstLabel: String, label: String,
      props: org.apache.spark.sql.Column): DataFrame =
    df.select(
      idc.cast("long").as("id"),
      src.cast("long").as("src"),
      lit(srcLabel).as("srcLabel"),
      dst.cast("long").as("dst"),
      lit(dstLabel).as("dstLabel"),
      lit(label).as("label"),
      props.as("props"),
      lit(0L).as("tx_min"),
      lit(null).cast("long").as("tx_max"))

  def edges(t: Tables): DataFrame = {
    val placed = edge(t.orders, col("o_orderkey") + E_PLACED,
      col("o_custkey") + CUST, "customer", col("o_orderkey") + ORDER, "order", "placed",
      propsMap("status" -> pvText(col("o_orderstatus"))))
    val custNat = edge(t.customer, col("c_custkey") + E_CUST_NAT,
      col("c_custkey") + CUST, "customer", col("c_nationkey") + NATION, "nation", "in_nation",
      propsMap("via" -> pvText(lit("customer"))))
    val suppNat = edge(t.supplier, col("s_suppkey") + E_SUPP_NAT,
      col("s_suppkey") + SUPP, "supplier", col("s_nationkey") + NATION, "nation", "in_nation",
      propsMap("via" -> pvText(lit("supplier"))))
    // contains + supplies both derive from lineitem, as two plain
    // union branches with TOP-LEVEL literal labels: a label filter
    // then constant-folds non-matching branches to empty, so
    // traversal/subgraph queries never touch the fact table at all —
    // the in-memory analog of label-partition pruning on a published
    // snapshot. (An explode-fused single scan halves full-graph IO
    // but hides the label inside the exploded struct, forcing EVERY
    // label-filtered query to scan lineitem; branch prunability wins
    // at scale — the full-graph double scan is one-off ingest cost,
    // the pruning benefits every query.)
    val contains = edge(t.lineitem,
      col("l_orderkey") * 8 + col("l_linenumber") + E_CONTAINS,
      col("l_orderkey") + ORDER, "order", col("l_partkey") + PART, "part", "contains",
      propsMap("returnflag" -> pvText(col("l_returnflag"))))
    val supplies = edge(t.lineitem,
      col("l_orderkey") * 8 + col("l_linenumber") + E_SUPPLIES,
      col("l_suppkey") + SUPP, "supplier", col("l_partkey") + PART, "part", "supplies",
      propsMap("linestatus" -> pvText(col("l_linestatus"))))
    val lineEdges = contains.unionAll(supplies)
    val natReg = edge(t.nation, col("n_nationkey") + E_NAT_REG,
      col("n_nationkey") + NATION, "nation", col("n_regionkey") + REGION, "region", "in_region",
      propsMap("via" -> pvText(lit("nation"))))
    placed.unionAll(custNat).unionAll(suppNat).unionAll(lineEdges).unionAll(natReg)
  }

  def snapshot(spark: SparkSession, dir: String): GraphSnapshot = {
    val t = Tables(spark, dir)
    GraphSnapshot(nodes(t), edges(t))
  }
}

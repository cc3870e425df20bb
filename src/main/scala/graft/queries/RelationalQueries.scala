package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Scans, filters, projections, joins, aggregations, set ops, limits —
  * the relational surface of the engine (SURVEY.md §2.2, §2.4–2.6).
  *
  * The reference's operators (`readOne`, `readAll`, `filterObjects`,
  * `filterRelations`, `nbNodes`, `ordNub`, `rsLimit`) are re-expressed
  * as declarative DataFrame plans so Catalyst can push filters and
  * projections into the parquet scan and pick join strategies.
  *
  * Numeric discipline for oracle parity: money columns are exact
  * 2-decimal doubles in the test data, so every aggregate first casts
  * to DECIMAL and does exact decimal arithmetic — identical results in
  * Spark and DuckDB regardless of summation order (a plain double sum
  * is order-dependent and would flake at 32 shuffle partitions).
  */
object RelationalQueries extends QueryModule {

  private val D18 = DecimalType(18, 2)
  private val D4  = DecimalType(4, 2)
  // Final aggregate outputs are DOUBLE on BOTH the Spark and the
  // oracle side. The sum itself is exact decimal arithmetic (order-
  // independent); the one decimal->double conversion at the end is
  // correctly rounded in both engines, so the bits agree. Emitting
  // DECIMAL instead — even pinned to (38,2) on both sides — fails the
  // driver's value hash, which canonicalizes decimal cells differently
  // per engine (CORRECTNESS_r02: every decimal-output query hash-failed
  // while every double-output query passed).
  private val D38 = DecimalType(38, 2)

  override def queries: Seq[QueryDef] = Seq(
    // ---- aggregation over a pushed-down scan (TPC-H Q1 shape) ----
    // Reference analog: maintained counters + property grouping
    // (STMGraph Raw.hs counts; HGraphStorage API.hs:293-295).
    QueryDef(
      "q1_agg",
      "groupBy aggregate with decimal-exact sums, filter pushed to scan",
      (s, dir) => {
        val li = Tables(s, dir).lineitem
        // to_timestamp parses in the session time zone (UTC) —
        // java.sql.Timestamp.valueOf would use the JVM default zone
        // and silently shift the cut on non-UTC machines
        li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(D18)).cast(D38).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(D18)).cast(D38).cast("double").as("sum_base_price"),
            sum(col("l_extendedprice").cast(D18) * (lit(1).cast(D4) - col("l_discount").cast(D4)))
              .cast(D38).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // ---- TPC-H Q3 shape: selective join pipeline + grouped top-k ----
    QueryDef(
      "q3_shipping",
      "unshipped-order revenue: 3-way join, group, deterministic top-10",
      (s, dir) => {
        val t   = Tables(s, dir)
        val cut = to_timestamp(lit("1997-03-15 00:00:00")) // session-tz (UTC) parse
        t.customer.filter(col("c_mktsegment") === "BUILDING")
          .join(t.orders.filter(col("o_orderdate") < cut),
            col("c_custkey") === col("o_custkey"))
          .join(t.lineitem.filter(col("l_shipdate") > cut),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast(D18) * (lit(1).cast(D4) - col("l_discount").cast(D4)))
            .cast(D38).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
             |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)
    ),

    // ---- TPC-H Q5 shape: star join across 5 tables ----
    QueryDef(
      "q5_local_volume",
      "revenue by nation where customer and supplier share the nation",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast(D18) * (lit(1).cast(D4) - col("l_discount").cast(D4)))
            .cast(D38).cast("double").as("revenue"))
      },
      Some("""SELECT n_name,
             |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)
    ),

    // ---- point lookup (readOne / getObject) ----
    // HGraphStorage FileOps.hs:311-314: ID -> record. Here the key
    // predicate reaches the parquet scan (PushedFilters) so only the
    // matching row group is read.
    QueryDef(
      "q_point_lookup",
      "point lookup by key, predicate pushed to parquet",
      (s, dir) => Tables(s, dir).customer.filter(col("c_custkey") === 42L),
      Some("SELECT * FROM customer WHERE c_custkey = 42")
    ),

    // ---- filtered scan + projection (filterObjects + column pruning) ----
    QueryDef(
      "q_filter_scan",
      "predicate + projection pushdown: 3 of 11 lineitem columns read",
      (s, dir) =>
        Tables(s, dir).lineitem
          .filter(col("l_quantity") <= lit(3.0) && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem WHERE l_quantity <= 3.0 AND l_returnflag = 'R'""".stripMargin)
    ),

    // ---- join with both endpoints (filterRelations analog) ----
    // edges ⋈ nodes ⋈ nodes: order lines joined to their order and
    // part. nation/part side is broadcast (small dim).
    QueryDef(
      "q_join_dims",
      "fact-to-dims join, small dims broadcast, decimal-exact revenue",
      (s, dir) => {
        val t  = Tables(s, dir)
        val li = t.lineitem
        val o  = t.orders
        val c  = t.customer
        val n  = t.nation
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(col("l_extendedprice").cast(D18) * (lit(1).cast(D4) - col("l_discount").cast(D4)))
              .cast(D38).cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT n_name,
             |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)
    ),

    // ---- semi join: membership (NID-style isin ≡ left-semi) ----
    QueryDef(
      "q_semi_join",
      "left-semi join: customers with at least one open order",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders.filter(col("o_orderstatus") === "O"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin)
    ),

    // ---- anti join: absence check (deletion orphan checks) ----
    QueryDef(
      "q_anti_join",
      "left-anti join: customers with no order above 300k",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders.filter(col("o_totalprice") > 300000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin)
    ),

    // ---- global top-k (limit with deterministic order) ----
    QueryDef(
      "q_topk",
      "global top-10 orders by price, deterministic tie-break",
      (s, dir) =>
        Tables(s, dir).orders
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)
    ),

    // ---- per-group top-k (rsLimit newest-first semantics, §2.6) ----
    // The reference's per-source limit over newest-first adjacency
    // becomes a window: partition by group, order desc, row_number<=k.
    QueryDef(
      "q_pergroup_limit",
      "per-group newest-first limit via row_number window",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables(s, dir).orders
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders) WHERE rn <= 2""".stripMargin)
    ),

    // ---- rollup (beyond reference: hierarchies "for free") ----
    QueryDef(
      "q_rollup",
      "rollup over (returnflag, linestatus): subtotals + grand total",
      (s, dir) =>
        Tables(s, dir).lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast(D18)).cast(D38).cast("double").as("sum_qty"), count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
    ),

    // ---- cube + grouping flags (full slice lattice) ----
    QueryDef(
      "q_cube",
      "cube over (returnflag, linestatus) with explicit grouping flags",
      (s, dir) =>
        Tables(s, dir).lineitem
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"),
            count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
             |  count(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)
    ),

    // ---- window-function suite over one ordered pass ----
    // rank / dense_rank / lag / running sum in a single window —
    // per-customer order history, fully ordered so every function is
    // deterministic across engines.
    QueryDef(
      "q_window_funcs",
      "rank, dense_rank, lag and running total over each customer's orders",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        Tables(s, dir).orders.select(
          col("o_custkey"), col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          sum(col("o_totalprice").cast(D18)).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast(D38).cast("double").as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(rank() OVER w AS BIGINT) AS rnk,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             |  lag(o_orderkey, 1) OVER w AS prev_order,
             |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             |             ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS DOUBLE) AS running_total
             |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin)
    ),

    // ---- exact interpolated quantiles per group ----
    QueryDef(
      "q_quantiles",
      "exact median and p90 of quantity per return flag",
      (s, dir) =>
        Tables(s, dir).lineitem
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_quantity, 0.9)"), 6).as("p90")),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
             |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // ---- distinct (ordNub analog, STMGraph APITypes.hs:199-204) ----
    QueryDef(
      "q_distinct",
      "distinct market segments",
      (s, dir) => Tables(s, dir).customer.select(col("c_mktsegment")).distinct(),
      Some("SELECT DISTINCT c_mktsegment FROM customer")
    ),

    // ---- set ops: intersect / except over key sets ----
    QueryDef(
      "q_intersect",
      "nations having both customers and suppliers",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.select(col("c_nationkey").as("nationkey"))
          .intersect(t.supplier.select(col("s_nationkey").as("nationkey")))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin)
    ),
    QueryDef(
      "q_except",
      "nations with rich customers but no rich suppliers",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.filter(col("c_acctbal") > 9000.0)
          .select(col("c_nationkey").as("nationkey"))
          .except(t.supplier.filter(col("s_acctbal") > 9000.0)
            .select(col("s_nationkey").as("nationkey")))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000.0""".stripMargin)
    ),

    // ---- union all preserving duplicates (Both semantics, §2.6) ----
    QueryDef(
      "q_union_all",
      "duplicate-preserving union of customer/supplier nation keys, counted",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.select(col("c_nationkey").cast("int").as("nationkey"))
          .unionAll(t.supplier.select(col("s_nationkey").cast("int").as("nationkey")))
          .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT nationkey, count(*) AS n FROM (
             |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
             |  UNION ALL
             |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
             |GROUP BY nationkey""".stripMargin)
    ),

    // ---- counts (nbNodes/nbEdges analog) ----
    QueryDef(
      "q_counts",
      "entity counts per table (maintained-counters analog)",
      (s, dir) => {
        val t = Tables(s, dir)
        def one(nm: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n")).select(lit(nm).as("entity"), col("n"))
        one("customer", t.customer)
          .unionAll(one("orders", t.orders))
          .unionAll(one("lineitem", t.lineitem))
          .unionAll(one("supplier", t.supplier))
      },
      Some("""SELECT 'customer' AS entity, count(*) AS n FROM customer
             |UNION ALL SELECT 'orders', count(*) FROM orders
             |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
             |UNION ALL SELECT 'supplier', count(*) FROM supplier""".stripMargin)
    )
  )
}

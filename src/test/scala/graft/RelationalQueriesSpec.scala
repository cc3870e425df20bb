package graft

import graft.queries.Catalog

class RelationalQueriesSpec extends GraftSuite {

  test("catalog has no duplicate names and all queries build") {
    assert(Catalog.all.nonEmpty)
    Catalog.all.foreach { q =>
      val df = q.build(spark, sf0001)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
    }
  }

  test("q1_agg groups and sums") {
    val df = Catalog.byName("q1_agg").build(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSet ==
      Set("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"))
  }

  test("q_point_lookup returns the single keyed row") {
    val rows = Catalog.byName("q_point_lookup").build(spark, sf0001).collect()
    assert(rows.length <= 1)
  }

  test("q_pergroup_limit returns at most 2 per customer") {
    val df = Catalog.byName("q_pergroup_limit").build(spark, sf0001)
    val over = df.groupBy("o_custkey").count().filter("count > 2").count()
    assert(over == 0)
  }

  test("semi + anti partition the customers") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, sf0001)
    val total = t.customer.count()
    val anti = Catalog.byName("q_anti_join").build(spark, sf0001).count()
    val withBigOrders = t.customer
      .join(t.orders.filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(withBigOrders + anti == total)
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.pipeline.Layout
import graft.sources.Tables

/** Gate for the Z-order clustered layout: the probe's RESULT must
  * equal a plain filter over the original table (layout moves bytes,
  * never rows), so the oracle is ordinary SQL over `lineitem` — every
  * layout bug (wrong interleave, wrong prefix enumeration, dropped
  * directory) surfaces as missing/extra rows.
  */
object LayoutQueries extends QueryModule {

  /** (partkey, suppkey) probe rectangle — inside the key range of
    * every SF (keys start at 1), relatively MORE selective as SF
    * grows, which is exactly the regime where the zp pruning pays.
    */
  private val (pLo, pHi) = (20.0, 80.0)
  private val (sLo, sHi) = (2.0, 5.0)

  override def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_layout_zorder",
      "rectangle probe over a Z-ordered (partkey, suppkey) copy of lineitem",
      (s, dir) => {
        val (path, layout) = SessionPublish.once(s, s"zorder|$dir") {
          val li = Tables(s, dir).lineitem
          val cols = Seq("l_partkey", "l_suppkey")
          val lay = Layout.ZLayout(cols, Layout.boundaries(li, cols, bits = 4),
            bits = 4, prefixBits = 4)
          val p = SessionPublish.tempDir("graft-zorder")
          Layout.writeZOrdered(li, p, lay)
          (p, lay)
        }
        // decimal-exact sum (order-independent), double only at the end
        // — the repo-wide discipline for summed double columns
        Layout.probe(s, path, layout, Seq((pLo, pHi), (sLo, sHi)))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(DecimalType(18, 2)))
              .cast(DecimalType(38, 2)).cast("double").as("sum_qty"))
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
              |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
              |FROM lineitem
              |WHERE l_partkey >= $pLo AND l_partkey <= $pHi
              |  AND l_suppkey >= $sLo AND l_suppkey <= $sHi
              |GROUP BY l_returnflag""".stripMargin)
    )
  )
}

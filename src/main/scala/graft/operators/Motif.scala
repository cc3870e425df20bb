package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraphSnapshot

/** Motif-style chain matching (SURVEY §7.1 M6 — the "beyond one hop"
  * tier): a path pattern
  *
  *   (n0)-[e0]->(n1)-[e1]->(n2)-...->(nK)
  *
  * compiled to a chain of equi-joins over the edge table. Each hop's
  * label constraints evaluate on the edge scan alone (denormalized
  * srcLabel/dstLabel, as in QueryStep), so no node join is ever
  * needed for type-constrained patterns; Catalyst handles join
  * ordering/broadcast. Output columns: node aliases `n0..nK`, edge
  * aliases `e0..e{K-1}` — one row per matching path, duplicates
  * preserved (a path IS its edge sequence).
  *
  * At scale each hop is one shuffle on the shared node alias; over a
  * bucketed snapshot (edges by src) the forward chain co-locates for
  * free.
  */
object Motif {

  /** One hop's constraints; None = unconstrained (wildcard). */
  final case class Hop(
      relLabel: Option[String] = None,
      srcLabel: Option[String] = None,
      dstLabel: Option[String] = None)

  def paths(g: GraphSnapshot, hops: Seq[Hop]): DataFrame = {
    require(hops.nonEmpty, "a motif needs at least one hop")
    val live = g.live
    def edgeFor(h: Hop, i: Int): DataFrame = {
      var e = live.edges
      h.relLabel.foreach(l => e = e.filter(col("label") === l))
      h.srcLabel.foreach(l => e = e.filter(col("srcLabel") === l))
      h.dstLabel.foreach(l => e = e.filter(col("dstLabel") === l))
      e.select(col("src").as(s"n$i"), col("id").as(s"e$i"), col("dst").as(s"n${i + 1}"))
    }
    hops.indices.tail.foldLeft(edgeFor(hops.head, 0)) { (acc, i) =>
      acc.join(edgeFor(hops(i), i), Seq(s"n$i"))
    }
  }
}

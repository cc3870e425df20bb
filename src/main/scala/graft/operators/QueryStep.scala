package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.GraphSnapshot

/** One-hop expansion with pushed-down filters — the reference's
  * `queryStep :: ObjectID -> RelationStep -> m [StepResult]`
  * (HGraphStorage Query.hs:42-82), distributed: it expands EVERY
  * source node in one plan instead of one driver-side chain walk.
  *
  * Semantics preserved (SURVEY §2.3a):
  *  - empty `relTypes`/`tgtTypes` = unrestricted (Query.hs:59-60);
  *  - relation-type and target-type filters evaluate on the edge scan
  *    alone via the denormalized labels (Query.hs:68) — no node join
  *    until after filtering;
  *  - `limit` counts matching results per source and returns the
  *    NEWEST edges first (LIFO adjacency, QueryTest.hs:49-50) —
  *    expressed as a per-group `row_number` window over edge id desc;
  *  - BOTH = OUT results then IN results, concatenated, duplicates
  *    preserved (Query.hs:51-57).
  */
object QueryStep {

  sealed trait Direction
  case object OUT  extends Direction
  case object IN   extends Direction
  case object BOTH extends Direction

  /** The target node as the host language sees it — the reference's
    * populated `GraphObject` (`populateObject`, API.hs): id, label,
    * multi-valued typed properties.
    */
  final case class TargetNode(id: Long, label: String,
      props: Map[String, Seq[graft.model.PropertyValue]])

  /** RelationStep (Query.hs:19-25). Two target-filter seams, mirroring
    * the reference's `rsTgtFilter :: GraphObject -> Bool` (Query.hs:23):
    *
    *  - `tgtFilter`: an opaque Column predicate over the joined target
    *    node's columns (`tgt_*`). PREFER THIS — Catalyst pushes it and
    *    it stays inside whole-stage codegen.
    *  - `tgtPredicate`: an ARBITRARY host-language closure over the
    *    decoded [[TargetNode]] — the full power of the reference seam
    *    (host-side set lookups, regexes over computed combinations,
    *    anything). Compiled as a typed `Dataset.filter` AFTER every
    *    columnar filter, so only rows that survived pushdown pay the
    *    documented cliff: per-row deserialization outside codegen
    *    (SURVEY §7.3). Both seams compose (AND) when set; `limit`
    *    counts rows that pass BOTH (filters precede the limit,
    *    Query.hs:63-64).
    */
  final case class RelationStep(
      relTypes: Seq[String] = Nil,
      direction: Direction = OUT,
      tgtTypes: Seq[String] = Nil,
      tgtFilter: Option[Column] = None,
      tgtPredicate: Option[TargetNode => Boolean] = None,
      limit: Option[Int] = None)

  /** Expand from source nodes. `sources` must expose column `id`
    * (any node DataFrame or an id list via `idList`).
    * Output: src_id, rel_id, direction, rel_label, rel_props,
    * tgt_id, tgt_label, tgt_props.
    */
  def apply(g: GraphSnapshot, sources: DataFrame, step: RelationStep): DataFrame =
    apply(g, sources, step, edgesByDst = None)

  /** As [[apply]], with an optional dst-clustered copy of the edge
    * table ([[GraphSnapshot.writeBucketed]] `mirrorByDst`): the IN
    * half expands from it, so when edges are bucketed by `src` and
    * the mirror by `dst`, BOTH-direction expansion joins are
    * shuffle-free in both directions.
    */
  def apply(g: GraphSnapshot, sources: DataFrame, step: RelationStep,
      edgesByDst: Option[DataFrame]): DataFrame = {
    val live = g.live
    val liveEdgesByDst = edgesByDst.map(_.filter(col("tx_max").isNull))

    def half(dir: Direction): DataFrame = {
      val (fromCol, toCol, toLabel) = dir match {
        case IN => ("dst", "src", "srcLabel")
        case _  => ("src", "dst", "dstLabel")
      }
      var e = if (dir == IN) liveEdgesByDst.getOrElse(live.edges) else live.edges
      if (step.relTypes.nonEmpty) e = e.filter(col("label").isin(step.relTypes: _*))
      if (step.tgtTypes.nonEmpty) e = e.filter(col(toLabel).isin(step.tgtTypes: _*))

      val srcIds = sources.select(col("id").as("src_id"))
      // one row per (source, matching edge); the join keeps the edge
      // scan filtered before any node lookup, like Query.hs:68
      var out = e.join(srcIds, e(fromCol) === col("src_id"), "inner")
        .select(
          col("src_id"),
          e("id").as("rel_id"),
          lit(dir.toString).as("direction"),
          e("label").as("rel_label"),
          e("props").as("rel_props"),
          e(toCol).as("tgt_id"),
          e(toLabel).as("tgt_label"))

      // materialize the target object (getObject, Query.hs:74) via a
      // per-id group: ids are unique per snapshot contract, so the
      // grouped form is a no-op on the data but carries a STRUCTURAL
      // uniqueness proof in the plan — when a caller never touches
      // tgt_props, EliminateUnusedUniqueJoin deletes this whole join
      // (one shuffle per hop instead of two)
      val tgt = live.nodes
        .select(col("id").as("tgt_id"), col("props").as("tgt_props"))
        .groupBy(col("tgt_id")).agg(first(col("tgt_props")).as("tgt_props"))
      out = out.join(tgt, Seq("tgt_id"), "left")

      step.tgtFilter.foreach(p => out = out.filter(p))
      // the arbitrary-closure seam runs LAST: every columnar filter
      // already pruned, so only surviving rows pay deserialization
      step.tgtPredicate.foreach { p =>
        out = out.filter { (r: org.apache.spark.sql.Row) =>
          p(TargetNode(
            r.getLong(r.fieldIndex("tgt_id")),
            r.getString(r.fieldIndex("tgt_label")),
            graft.model.PropValues.propsFromRow(r, "tgt_props")))
        }
      }
      out.select("src_id", "rel_id", "direction", "rel_label", "rel_props",
        "tgt_id", "tgt_label", "tgt_props")
    }

    val expanded = step.direction match {
      case BOTH => half(OUT).unionAll(half(IN))
      case d    => half(d)
    }

    step.limit match {
      case Some(k) =>
        // newest-first per source; in BOTH the OUT half wins ties by
        // direction ordering, matching OUT-then-IN concatenation
        val w = Window.partitionBy(col("src_id"))
          .orderBy(col("direction").desc, col("rel_id").desc)
        expanded.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
      case None => expanded
    }
  }

  /** Convenience: expand from an explicit id list (the reference's
    * single-ObjectID entry point).
    */
  def fromIds(g: GraphSnapshot, ids: Seq[Long], step: RelationStep): DataFrame =
    apply(g, g.nodes.filter(col("id").isin(ids: _*)).select("id"), step)
}

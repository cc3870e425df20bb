package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraphSnapshot
import graft.model.{PropertyValue, PropValues}

/** Composable Gremlin-style traversal — the STMGraph `Traversal` ADT
  * (APITypes.hs:105-121) compiled to a DataFrame plan instead of an
  * STM state machine (API.hs:252-346).
  *
  * Each step refines a symbolic state; the whole composition stays one
  * lazy Catalyst plan — the reference's "SAllNodes stays symbolic
  * until refined" laziness (API.hs:256-295) is inherent here, and its
  * SEmpty short-circuit is Catalyst's PropagateEmptyRelation.
  *
  * Semantics preserved (SURVEY §2.3b, conformance in TraversalSpec):
  *  - `OutE/InE` with an EMPTY type list → Empty (stricter than
  *    queryStep! API.hs:314-339); `"*"` is the wildcard (readEdges
  *    :421);
  *  - `Out/In` keep duplicates (edgesToNodes :367-374); `Both` is
  *    In ++ Out concatenation, duplicates preserved (APISpec :386-389);
  *  - `Values` keeps entities and returns empty lists for unknown
  *    names (APISpec :242-246); `AllValues` also unions seen names;
  *  - illegal step/state combos are plan-time errors (SError analog).
  */
sealed trait Traversal {
  def andThen(next: Traversal): Traversal = Traversal.Composed(Seq(this, next))
}

object Traversal {
  case object Ns extends Traversal
  case object Es extends Traversal
  final case class NID(ids: Seq[Long]) extends Traversal
  final case class EID(ids: Seq[Long]) extends Traversal
  final case class Has(name: String, value: PropertyValue) extends Traversal
  final case class Values(names: Seq[String]) extends Traversal
  case object AllValues extends Traversal
  final case class Out(types: Seq[String]) extends Traversal
  final case class In(types: Seq[String]) extends Traversal
  final case class Both(types: Seq[String]) extends Traversal
  final case class OutE(types: Seq[String]) extends Traversal
  final case class InE(types: Seq[String]) extends Traversal
  final case class BothE(types: Seq[String]) extends Traversal
  case object Noop extends Traversal
  final case class Composed(steps: Seq[Traversal]) extends Traversal

  /** Interpreter states (APITypes.hs:133-142), DataFrame-shaped. */
  sealed trait TState
  final case class SNodes(df: DataFrame) extends TState
  final case class SEdges(df: DataFrame) extends TState
  final case class SProperties(df: DataFrame) extends TState
  case object SEmptyState extends TState

  final class TraversalException(msg: String) extends IllegalArgumentException(msg)

  /** Result of a traversal: which kind plus the plan. Ordering is not
    * part of the contract (the reference's reverse-insertion order is
    * a storage artifact); compare as multisets. `properties` rows are
    * flattened Info records: (id, label, name, seq, vType, vText,
    * vInt, vBin, vJson).
    */
  final case class TraversalResult(kind: String, df: DataFrame)

  def run(g: GraphSnapshot, t: Traversal): TraversalResult = {
    val end = step(g, SEmptyState, flatten(t))
    end match {
      case SNodes(df)      => TraversalResult("nodes", df)
      case SEdges(df)      => TraversalResult("edges", df)
      case SProperties(df) => TraversalResult("properties", df)
      case SEmptyState =>
        TraversalResult("empty", g.nodes.filter(lit(false)))
    }
  }

  private def flatten(t: Traversal): Seq[Traversal] = t match {
    case Composed(ss) => ss.flatMap(flatten)
    case Noop         => Nil
    case s            => Seq(s)
  }

  private def step(g: GraphSnapshot, st: TState, steps: Seq[Traversal]): TState =
    steps.foldLeft(st)((s, t) => one(g, s, t))

  private def edgeTypeFilter(df: DataFrame, types: Seq[String]): Option[DataFrame] =
    if (types.isEmpty) None // empty list = Empty (API.hs:314-339)
    else if (types.contains("*")) Some(df)
    else Some(df.filter(col("label").isin(types: _*)))

  private def one(g: GraphSnapshot, st: TState, t: Traversal): TState = (st, t) match {
    case (_, Ns) => SNodes(g.live.nodes)
    case (_, Es) => SEdges(g.live.edges)

    case (SNodes(df), NID(ids)) => SNodes(df.filter(col("id").isin(ids: _*)))
    case (SEdges(df), EID(ids)) => SEdges(df.filter(col("id").isin(ids: _*)))

    case (SNodes(df), Has(n, v)) => SNodes(df.filter(PropValues.hasValue(col("props"), n, v)))
    case (SEdges(df), Has(n, v)) => SEdges(df.filter(PropValues.hasValue(col("props"), n, v)))

    // node -> edges
    case (SNodes(df), OutE(ts)) =>
      edgeTypeFilter(g.live.edges, ts) match {
        case None => SEmptyState
        case Some(e) =>
          SEdges(e.join(df.select(col("id").as("__nid")), e("src") === col("__nid"), "inner")
            .drop("__nid"))
      }
    case (SNodes(df), InE(ts)) =>
      edgeTypeFilter(g.live.edges, ts) match {
        case None => SEmptyState
        case Some(e) =>
          SEdges(e.join(df.select(col("id").as("__nid")), e("dst") === col("__nid"), "inner")
            .drop("__nid"))
      }
    case (st0, BothE(ts)) =>
      (one(g, st0, InE(ts)), one(g, st0, OutE(ts))) match {
        case (SEdges(a), SEdges(b)) => SEdges(a.unionAll(b)) // In ++ Out (API.hs:340-345)
        case _                      => SEmptyState
      }

    // node -> neighbor nodes: OutE/InE then edge->endpoint, dups kept
    case (st0 @ SNodes(_), Out(ts)) => endpoints(g, one(g, st0, OutE(ts)), "dst")
    case (st0 @ SNodes(_), In(ts))  => endpoints(g, one(g, st0, InE(ts)), "src")
    case (st0 @ SNodes(_), Both(ts)) =>
      (endpoints(g, one(g, st0, InE(ts)), "src"), endpoints(g, one(g, st0, OutE(ts)), "dst")) match {
        case (SNodes(a), SNodes(b)) => SNodes(a.unionAll(b))
        case (SEmptyState, s)       => s
        case (s, SEmptyState)       => s
        case _                      => SEmptyState
      }

    // terminal projections (API.hs:296-297,348-365)
    case (SNodes(df), Values(names))  => SProperties(projectValues(df, Some(names)))
    case (SEdges(df), Values(names))  => SProperties(projectValues(df, Some(names)))
    case (SNodes(df), AllValues)      => SProperties(projectValues(df, None))
    case (SEdges(df), AllValues)      => SProperties(projectValues(df, None))

    case (SEmptyState, _) => SEmptyState // dead branch stays dead (API.hs:253)

    case (s, x) =>
      throw new TraversalException(s"illegal step $x in state ${s.getClass.getSimpleName}")
  }

  /** Map an edge set to its endpoint nodes, preserving multiplicity
    * (edgesToNodes, API.hs:367-374).
    */
  private def endpoints(g: GraphSnapshot, st: TState, end: String): TState = st match {
    case SEdges(e) =>
      val n = g.live.nodes
      SNodes(e.select(col(end).as("__eid"))
        .join(n, col("__eid") === n("id"), "inner")
        .drop("__eid"))
    case other => other
  }

  /** Flatten Info{id, typeName, [NameValue]} to long-format rows.
    * With `names`, restrict to those (missing name -> no row; the
    * entity itself is kept via the left join with a null name when it
    * has none of the requested properties — mirroring "empty property
    * list" results, APISpec :242-246).
    */
  private def projectValues(df: DataFrame, names: Option[Seq[String]]): DataFrame = {
    val wanted = names match {
      case Some(ns) =>
        // keep requested names only, in the entity's map
        df.select(col("id"), col("label"),
          explode_outer(map_filter(col("props"), (k, _) => k.isin(ns: _*)))
            .as(Seq("name", "vals")))
      case None =>
        df.select(col("id"), col("label"), explode_outer(col("props")).as(Seq("name", "vals")))
    }
    wanted
      .select(col("id"), col("label"), col("name"), posexplode_outer(col("vals")).as(Seq("seq", "v")))
      .select(col("id"), col("label"), col("name"), col("seq"),
        col("v.vType").as("vType"), col("v.vText").as("vText"),
        col("v.vInt").as("vInt"), col("v.vBin").as("vBin"), col("v.vJson").as("vJson"))
  }
}

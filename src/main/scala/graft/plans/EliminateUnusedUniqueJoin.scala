package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, EqualTo, NamedExpression}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Join elimination under a provable uniqueness constraint.
  *
  * A left-outer equi-join whose right side is unique on the join key
  * preserves the left side's rows and columns exactly; if nothing
  * above the join references any right-side column, the join is dead
  * weight — remove it. Uniqueness is proven STRUCTURALLY: the right
  * side must be an `Aggregate` grouping by exactly the join key
  * (possibly under column-pruning `Project`s), which guarantees one
  * row per key by construction.
  *
  * This is the optimizer seam the graph operators lean on: QueryStep
  * materializes the target object (`getObject`, HGraphStorage
  * Query.hs:74) through a per-id grouped node lookup, so a caller
  * that only consumes edge columns (ids, labels) gets a plan with no
  * node join at all — one shuffle instead of two on every hop. Spark
  * cannot do this itself because DataFrames carry no unique-key
  * metadata; the grouped shape carries the proof in the plan.
  *
  * Runs in the user-provided optimizer batch (after column pruning,
  * so "unused" is decided on the pruned plan). Registered by
  * [[graft.core.Graft.session]] and
  * [[graft.functions.GraftExtensions]].
  */
object EliminateUnusedUniqueJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(pl, j: Join) if eliminable(j, refs(pl)) =>
      p.copy(child = j.left)
    case a @ Aggregate(ge, ae, j: Join, _) if eliminable(j, refs(ge.flatMap(_.references) ++ ae)) =>
      a.copy(child = j.left)
  }

  private def refs(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): AttributeSet =
    AttributeSet(es.flatMap(_.references))

  private def eliminable(j: Join, above: AttributeSet): Boolean =
    j.joinType == LeftOuter &&
      above.intersect(j.right.outputSet).isEmpty &&
      (j.condition match {
        case Some(EqualTo(a: Attribute, b: Attribute)) =>
          val sides = Seq(a, b)
          sides.exists(j.left.outputSet.contains) &&
            sides.find(j.right.outputSet.contains).exists(uniqueOn(j.right, _))
        case _ => false
      })

  private def stripAlias(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = e match {
    case Alias(c, _) => stripAlias(c)
    case other       => other
  }

  /** The plan provably emits at most one row per value of `k`: an
    * Aggregate with a single grouping expression whose output column
    * for `k` is that grouping expression (modulo aliasing), seen
    * through any column-pruning projections that keep `k` as-is.
    */
  @scala.annotation.tailrec
  private def uniqueOn(p: LogicalPlan, k: Attribute): Boolean = p match {
    case Aggregate(Seq(g), aggExprs, _, _) =>
      aggExprs.find(_.toAttribute.exprId == k.exprId)
        .exists(ne => stripAlias(ne).semanticEquals(stripAlias(g)))
    case Project(projList, child) if projList.exists {
          case att: Attribute => att.exprId == k.exprId
          case _              => false
        } =>
      uniqueOn(child, k)
    case _ => false
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of common elements between two SORTED, duplicate-free
  * ARRAY<LONG> (or ARRAY<INT>) columns — the inner loop of
  * adjacency-intersection triangle counting
  * ([[graft.analytics.GraphAnalytics.triangleCount]]).
  *
  * `size(array_intersect(a, b))` computes the same number but builds
  * a hash set AND materializes the intersection array per row — on a
  * dense co-occurrence graph (453k oriented edges × ~450-element
  * neighbor arrays at sf0.1) that allocation is the entire bench
  * line. Sorted inputs admit a two-pointer merge: zero allocation,
  * one pass, inside whole-stage codegen.
  *
  * CONTRACT: both arrays ascending-sorted with no duplicates and no
  * nulls (what `sort_array(collect_list(..))` over distinct edges
  * produces). On such inputs the result equals
  * `size(array_intersect(a, b))` exactly; unsorted input silently
  * undercounts, which is why the operator, not the user, builds the
  * arrays.
  *
  * Custom-operator ladder (SURVEY §7.3): tier (b) — a scalar
  * `Expression` with `doGenCode`; built-ins express the semantics
  * but not the allocation-free merge.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> or two array<int>, got ($l, $r)")
  }

  private def elemIsLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val isLong = elemIsLong
    def get(arr: ArrayData, i: Int): Long =
      if (isLong) arr.getLong(i) else arr.getInt(i).toLong
    var i = 0; var j = 0; var c = 0L
    val na = x.numElements(); val nb = y.numElements()
    while (i < na && j < nb) {
      val xi = get(x, i); val yj = get(y, j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val getter = if (elemIsLong) "getLong" else "getInt"
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $xi = (long) $a.$getter($i);
         |  long $yj = (long) $b.$getter($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  val NAME = "sorted_intersect_count"

  /** Register on a session; afterwards use [[col]] or SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")

  /** Column API (requires [[register]] — `Graft.session` does it). */
  def col(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(NAME, a, b)
}

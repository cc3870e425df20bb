package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Common ELEMENTS of two SORTED, duplicate-free ARRAY<LONG> (or
  * ARRAY<INT>) columns, as ARRAY<LONG> — the elements sibling of
  * [[SortedIntersectCount]], for per-vertex triangle attribution
  * ([[graft.analytics.GraphAnalytics.clusteringCoefficients]]): the
  * apex of every closed wedge is an intersection ELEMENT, so the
  * per-apex credit needs the values, not just the count.
  *
  * `array_intersect(a, b)` computes the same array but builds a hash
  * set per row; sorted inputs admit a two-pointer merge whose only
  * allocation is the result itself, inside whole-stage codegen.
  *
  * CONTRACT (same as the count form): both arrays ascending-sorted,
  * duplicate- and null-free — what `sort_array(collect_list(..))`
  * over distinct edges produces. On such inputs the result equals
  * `array_intersect(a, b)` exactly (ascending order); the operator,
  * not the user, builds the arrays.
  */
case class SortedIntersect(left: Expression, right: Expression)
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

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val isLong = elemIsLong
    def get(arr: ArrayData, i: Int): Long =
      if (isLong) arr.getLong(i) else arr.getInt(i).toLong
    val na = x.numElements(); val nb = y.numElements()
    val tmp = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val xi = get(x, i); val yj = get(y, j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { tmp(k) = xi; k += 1; i += 1; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(tmp, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val tmp = ctx.freshName("tmp")
      val getter = if (elemIsLong) "getLong" else "getInt"
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |long[] $tmp = new long[Math.min($na, $nb)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xi = (long) $a.$getter($i);
         |  long $yj = (long) $b.$getter($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else { $tmp[$k++] = $xi; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($tmp, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersect {
  val NAME = "sorted_intersect"

  /** Register on a session; afterwards use [[col]] or SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => SortedIntersect(exprs(0), exprs(1)), "scala_udf")

  /** Column API (requires [[register]] — `Graft.session` does it). */
  def col(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(NAME, a, b)
}

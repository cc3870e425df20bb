package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Matrix × vector as ONE codegen'd expression: `y_i = Σ_j M(i,j)·v_j`
  * with double accumulation (j ascending) and a float-rounded result
  * element — the rotation step of OPQ encoding
  * ([[graft.pipeline.Opq]]). The matrix arrives as a foldable
  * `array<array<float>>` literal and is folded to one primitive array
  * per JVM, so plan size and generated code are O(1) in the matrix
  * dimensions (the [[NearestCell]] pattern). Driver-side rotation in
  * [[graft.pipeline.Opq]] uses the same accumulation order, so trained
  * codebooks and distributed encodes see bit-identical rotated floats.
  */
case class MatVec(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable array<array<float>>), got ($l, $r)")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec"

  @transient private lazy val rows: Array[Array[Float]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toFloatArray())
  }
  @transient private lazy val dimOut: Int = rows.length
  @transient private lazy val dimIn: Int = if (rows.isEmpty) 0 else rows(0).length
  @transient private lazy val flat: Array[Float] = {
    val out = new Array[Float](dimOut * dimIn)
    var i = 0
    while (i < dimOut) {
      System.arraycopy(rows(i), 0, out, i * dimIn, math.min(dimIn, rows(i).length))
      i += 1
    }
    out
  }

  override def nullSafeEval(v: Any, m: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(dimIn, x.numElements())
    val out = new Array[Float](dimOut)
    var i = 0
    while (i < dimOut) {
      var acc = 0.0
      val off = i * dimIn
      var j = 0
      while (j < n) { acc += flat(off + j).toDouble * x.getFloat(j).toDouble; j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("rotMatrix", flat, "float[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val off = ctx.freshName("off")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($dimIn, $v.numElements());
         |float[] $out = new float[$dimOut];
         |for (int $i = 0; $i < $dimOut; $i++) {
         |  double $acc = 0.0;
         |  int $off = $i * $dimIn;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += ((double) $flatRef[$off + $j]) * ((double) $v.getFloat($j));
         |  }
         |  $out[$i] = (float) $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MatVec {
  val NAME = "mat_vec"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => MatVec(exprs(0), exprs(1)), "scala_udf")

  def col(vec: Column, matrix: Array[Array[Float]]): Column =
    org.apache.spark.sql.functions.call_function(NAME, vec,
      Lits.floatMatrix(matrix.map(_.toSeq).toSeq))
}

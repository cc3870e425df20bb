package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-ROW SQ8 scoring weights for batch search:
  * `out = [bias, w1_0 .. w1_{dim-1}]` with
  * `bias = SUM (lo_d² - 2 q_d lo_d)` and `w1_d = 2 step_d (lo_d - q_d)`
  * over the foldable lo/step literals — the column form of
  * [[graft.pipeline.Sq.sqLut]] with the IDENTICAL accumulation order
  * (bias terms left-to-right in doubles), so weights built here are
  * bit-for-bit the weights the driver builds for the same vector.
  * (The quadratic weights w2_d = step_d² are query-independent and
  * stay literals on the corpus side.)
  *
  * Cost model: evaluated once per QUERY row (the broadcast side of
  * [[graft.pipeline.Sq.topKBatchSq]]), never per corpus row —
  * corpus-side scoring is plain `element_at` reads of the result,
  * exactly [[PqLut]]'s division of labor.
  */
case class SqWeights(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), ArrayType(DoubleType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, foldable array<float> lo, " +
            s"foldable array<double> step), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_weights"

  @transient private lazy val lo: Array[Float] =
    second.eval().asInstanceOf[ArrayData].toFloatArray()
  @transient private lazy val step: Array[Double] =
    third.eval().asInstanceOf[ArrayData].toDoubleArray()

  /** [[graft.pipeline.Sq.sqLut]]'s exact loop. */
  def compute(v: ArrayData): ArrayData = {
    val q = v.toFloatArray()
    val dim = lo.length
    val out = new Array[Double](dim + 1)
    var bias = 0.0
    var d = 0
    while (d < dim) {
      val l = lo(d).toDouble
      val qd = if (d < q.length) q(d).toDouble else 0.0
      bias += l * l - 2.0 * qd * l
      out(d + 1) = 2.0 * step(d) * (l - qd)
      d += 1
    }
    out(0) = bias
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any, l: Any, s: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sqWeights", this, classOf[SqWeights].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = $self.compute($v);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

object SqWeights {
  val NAME = "sq_weights"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => SqWeights(exprs(0), exprs(1), exprs(2)), "scala_udf")

  def col(vec: Column, lo: Array[Float], step: Array[Double]): Column =
    org.apache.spark.sql.functions.call_function(NAME, vec,
      Lits.floats(lo.toSeq),
      Lits.doubles(step.toSeq))
}

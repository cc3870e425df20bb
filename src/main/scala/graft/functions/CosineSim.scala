package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two ARRAY<FLOAT> columns.
  *
  * The composable form (`zip_with` + `aggregate`) evaluates its
  * lambdas per element in interpreted mode — fine for one query,
  * measurable at ANN-scan scale. This expression generates a tight
  * fused loop (dot product + both norms in one pass) inside
  * whole-stage codegen. For equal-length inputs the element order and
  * arithmetic (float→double promote, multiply, sequential add,
  * dot/(√a·√b)) exactly match the composable form, so results are
  * bit-identical and the DuckDB oracles are unaffected. Mismatched
  * lengths differ by design: this expression computes over the
  * min-length prefix, while zip_with null-pads and aggregates to null.
  *
  * Custom-operator ladder (SURVEY §7.3): this is tier (b) — a scalar
  * `Expression` with `doGenCode` — chosen because built-ins can
  * express the semantics but not the fused single-pass evaluation.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSim {
  val NAME = "cosine_sim"

  /** Register on a session; afterwards use [[col]] or SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")

  /** Column API. The session must have the function registered:
    * `Graft.session` / `Graft.registerFunctions(spark)` /
    * GraftExtensions all do; callers building their own bare session
    * must call [[register]] first.
    */
  def col(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(NAME, a, b)
}

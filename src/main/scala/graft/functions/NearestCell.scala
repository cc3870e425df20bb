package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid cell assignment for IVF ANN:
  * `argmin_c (|c|² - 2 v·c)` over a centroid matrix, ties to the
  * lower cell id.
  *
  * The matrix arrives as ONE foldable `array<array<float>>` literal
  * and is folded to primitive arrays once on the driver, so the
  * expression tree and the generated code are O(1) in `nlist` — the
  * per-centroid `array_min(array(struct(...)))` formulation this
  * replaces grew the plan linearly and hit Janino method limits at
  * realistic IVF sizes (nlist 4k-64k). The flattened matrix rides the
  * task binary as a codegen reference object (nlist·dim·4 bytes,
  * broadcast once per stage by Spark); beyond ~10^5 cells, shard the
  * corpus and train per shard instead.
  */
case class NearestCell(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable array<array<float>>), got ($l, $r)")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  // folded once per JVM from the literal; row-independent by the
  // foldable requirement above
  @transient private lazy val centroids: Array[Array[Float]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toFloatArray())
  }
  @transient private lazy val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  @transient private lazy val flat: Array[Float] = {
    val out = new Array[Float](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      System.arraycopy(centroids(c), 0, out, c * dim, math.min(dim, centroids(c).length))
      c += 1
    }
    out
  }
  // same addition order as the Scala-side training norm (foldLeft)
  @transient private lazy val c2: Array[Double] =
    centroids.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))

  override def nullSafeEval(v: Any, m: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(dim, x.length)
    var best = Double.PositiveInfinity
    var bestCell = 0
    var c = 0
    while (c < centroids.length) {
      var dot = 0.0
      val off = c * dim
      var j = 0
      while (j < n) { dot += flat(off + j).toDouble * x(j).toDouble; j += 1 }
      val d = c2(c) - 2.0 * dot
      if (d < best) { best = d; bestCell = c }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cellMatrix", flat, "float[]")
    val c2Ref   = ctx.addReferenceObj("cellNorms", c2, "double[]")
    val nlist   = centroids.length
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestCell = ctx.freshName("bestCell")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestCell = 0;
         |for (int $c = 0; $c < $nlist; $c++) {
         |  double $dot = 0.0;
         |  int $off = $c * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $flatRef[$off + $j]) * ((double) $v.getFloat($j));
         |  }
         |  double $d = $c2Ref[$c] - 2.0 * $dot;
         |  if ($d < $best) { $best = $d; $bestCell = $c; }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NearestCell {
  val NAME = "nearest_cell"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => NearestCell(exprs(0), exprs(1)), "scala_udf")

  def col(vec: Column, centroids: Array[Array[Float]]): Column =
    org.apache.spark.sql.functions.call_function(NAME, vec,
      Lits.floatMatrix(centroids.map(_.toSeq).toSeq))
}

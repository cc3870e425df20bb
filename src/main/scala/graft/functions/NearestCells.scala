package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `nprobe` nearest centroid cells of a vector, in ascending
  * distance order (ties to the lower cell id) — the batch-query side
  * of IVF ANN: where [[NearestCell]] assigns ONE cell at publish time,
  * this expression computes each QUERY vector's probe list, so a kNN
  * join can fan a whole query set out to (query, cell) pairs in a
  * single codegen'd scan instead of a driver-side [[graft.pipeline.Ivf.probeOrder]]
  * call per query (the reference's every-key sweep shape,
  * HGraphStorage perf/.../HackageTest.hs:150-165).
  *
  * Distance semantics are identical to [[NearestCell]]:
  * `d_c = |c|² - 2 v·c` (monotone in true distance for fixed v), doubles
  * accumulated left-to-right, first-wins on ties — the k=1 prefix of
  * this expression's output always equals `nearest_cell`. The centroid
  * matrix arrives as one foldable literal, folded to primitive arrays
  * once; codegen keeps a k-slot insertion buffer, so cost is
  * O(nlist·dim + nlist·k) per row with k ≤ nlist tiny.
  */
case class NearestCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, foldable array<array<float>>, foldable int), " +
            s"got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val centroids: Array[Array[Float]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
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
  @transient private lazy val k: Int =
    math.min(math.max(third.eval().asInstanceOf[Int], 1), centroids.length)

  override def nullSafeEval(v: Any, m: Any, kk: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(dim, x.length)
    val bd = Array.fill(k)(Double.PositiveInfinity)
    // seed slots with DISTINCT cells: a NaN-bearing vector scores NaN
    // against every centroid (all comparisons false, no insertions),
    // and an all-zeros buffer would then emit k copies of cell 0 —
    // duplicate (query, cell) rows after the explode, duplicate ids
    // in the per-query top-k. Seeded, the degenerate output is the
    // first k cells: arbitrary but valid, and the "k = nlist emits
    // every cell once" invariant holds for every input.
    val bc = Array.tabulate(k)(identity)
    var c = 0
    while (c < centroids.length) {
      var dot = 0.0
      val off = c * dim
      var j = 0
      while (j < n) { dot += flat(off + j).toDouble * x(j).toDouble; j += 1 }
      val d = c2(c) - 2.0 * dot
      if (d < bd(k - 1)) {
        var p = k - 1
        while (p > 0 && d < bd(p - 1)) { bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1 }
        bd(p) = d; bc(p) = c
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, math.min(k, centroids.length)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cellMatrix", flat, "float[]")
    val c2Ref   = ctx.addReferenceObj("cellNorms", c2, "double[]")
    val nlist   = centroids.length
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val bd = ctx.freshName("bd"); val bc = ctx.freshName("bc"); val p = ctx.freshName("p")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |double[] $bd = new double[$k];
         |int[] $bc = new int[$k];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |for (int $j = 0; $j < $k; $j++) { $bc[$j] = $j; } // NaN-vector seed (see eval)
         |for (int $c = 0; $c < $nlist; $c++) {
         |  double $dot = 0.0;
         |  int $off = $c * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $flatRef[$off + $j]) * ((double) $v.getFloat($j));
         |  }
         |  double $d = $c2Ref[$c] - 2.0 * $dot;
         |  if ($d < $bd[$k - 1]) {
         |    int $p = $k - 1;
         |    while ($p > 0 && $d < $bd[$p - 1]) {
         |      $bd[$p] = $bd[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $d; $bc[$p] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bc);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object NearestCells {
  val NAME = "nearest_cells"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => NearestCells(exprs(0), exprs(1), exprs(2)), "scala_udf")

  def col(vec: Column, centroids: Array[Array[Float]], k: Int): Column =
    org.apache.spark.sql.functions.call_function(NAME, vec,
      Lits.floatMatrix(centroids.map(_.toSeq).toSeq),
      org.apache.spark.sql.functions.lit(k))
}

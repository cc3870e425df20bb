package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-ROW ADC lookup table for batch PQ search:
  * `lut[s][j] = |c_sj|² - 2 · v_s · c_sj` over a PQ codebook literal —
  * the column form of [[graft.pipeline.Pq.adcLut]], with the identical
  * accumulation order (c2 and dot interleaved left-to-right in
  * doubles), so a LUT built here is bit-for-bit the LUT the driver
  * builds for the same vector.
  *
  * Why an expression and not composition: the LUT has nsub·ksub
  * entries (2048 at the canonical 8×256), and composing it from
  * per-entry dot-product expressions would put thousands of nodes in
  * the plan — this stays ONE node with the codebook folded to
  * primitive arrays once per JVM, exactly the [[NearestCell]] move.
  *
  * Cost model: evaluated once per QUERY row (the broadcast side of
  * [[graft.pipeline.Pq.topKBatchAdc]] — thousands of rows), never per
  * corpus row; corpus-side scoring is plain `element_at` lookups into
  * the result. The generated code delegates the nested-array build to
  * [[compute]] via a codegen reference — the call is per query row,
  * so keeping the surrounding operator inside whole-stage codegen is
  * what matters, not inlining the loop.
  */
case class PqLut(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(ArrayType(FloatType, _), _), _))
        if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable array<array<array<float>>>), got ($l, $r)")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  // folded once per JVM from the literal (row-independent by the
  // foldable requirement): codebooks(s)(j) flattened per subspace
  @transient private lazy val books: Array[Array[Float]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { s =>
      val cb = arr.getArray(s)
      val ksub = cb.numElements()
      val dsub = if (ksub == 0) 0 else cb.getArray(0).numElements()
      val flat = new Array[Float](ksub * dsub)
      var j = 0
      while (j < ksub) {
        val e = cb.getArray(j).toFloatArray()
        System.arraycopy(e, 0, flat, j * dsub, math.min(dsub, e.length))
        j += 1
      }
      flat
    }
  }
  @transient private lazy val ksub: Int = {
    val arr = right.eval().asInstanceOf[ArrayData]
    if (arr.numElements() == 0) 0 else arr.getArray(0).numElements()
  }
  @transient private lazy val dsub: Int =
    if (ksub == 0 || books(0).length == 0) 0 else books(0).length / ksub

  /** The full nested LUT for one vector — [[graft.pipeline.Pq.adcLut]]'s
    * exact loop over the folded codebooks.
    */
  def compute(v: ArrayData): ArrayData = {
    val x = v.toFloatArray()
    val nsub = books.length
    val out = new Array[ArrayData](nsub)
    var s = 0
    while (s < nsub) {
      val flat = books(s)
      val off = s * dsub
      val row = new Array[Double](ksub)
      var j = 0
      while (j < ksub) {
        var c2 = 0.0; var dot = 0.0; var d = 0
        val base = j * dsub
        while (d < dsub) {
          val c = flat(base + d).toDouble
          c2 += c * c
          // out-of-range query dims contribute 0 (mirrors NearestCell's
          // min-length guard; well-formed data never hits it)
          if (off + d < x.length) dot += c * x(off + d).toDouble
          d += 1
        }
        row(j) = c2 - 2.0 * dot
        j += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any, m: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $self.compute($v);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqLut {
  val NAME = "pq_lut"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => PqLut(exprs(0), exprs(1)), "scala_udf")

  def col(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    org.apache.spark.sql.functions.call_function(NAME, vec,
      Lits.floatCube(codebooks.map(_.map(_.toSeq).toSeq).toSeq))
}

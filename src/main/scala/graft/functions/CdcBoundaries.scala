package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CDC boundary positions of a document in one codegen'd pass — the
  * hot loop of [[graft.pipeline.Cdc.chunks]].
  *
  * Returns the ascending 1-based CHARACTER positions `i` (code-point
  * counted, matching `substr`/`length`/`ascii` semantics) where the
  * [[graft.pipeline.Cdc.W]]-char polynomial rolling hash satisfies
  * `hash(i) % Mod % avgChunk == 0` for `i >= W`, with the final
  * position always appended (exactly once) so chunks tile the text;
  * an empty string yields an empty array. Bit-identical to the
  * `transform`/`filter` higher-order-function form it replaces — same
  * integer polynomial, same modulus chain — but those lambdas
  * evaluate INTERPRETED per character, which at 100 TB is a constant
  * factor paid on every byte of the corpus. Here the whole scan is
  * one generated loop: decode code point, roll the window, 8
  * multiply-adds, two mods.
  *
  * Custom-operator ladder (SURVEY §7.3): tier (b) — scalar
  * `Expression` with `doGenCode`; the built-in HOFs express the
  * semantics but cannot leave interpretation.
  */
case class CdcBoundaries(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got ($l, $r)")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val avg = b.asInstanceOf[Int]
    UnsafeArrayData.fromPrimitiveArray(CdcBoundaries.boundaries(s, avg))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val helper = CdcBoundaries.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($helper.boundaries($a.toString(), $b));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CdcBoundaries {
  val NAME = "cdc_boundaries"

  import graft.pipeline.Cdc.{W, Base, Mod}

  private val pows: Array[Long] =
    Iterator.iterate(1L)(_ * Base).take(W).toArray

  /** The scan itself — shared by interpreted eval and codegen (the
    * generated code calls this directly: the loop is monomorphic JIT
    * fodder either way, and one body keeps the two paths identical).
    */
  def boundaries(s: String, avgChunk: Int): Array[Int] = {
    require(avgChunk >= 1, s"avgChunk must be >= 1, got $avgChunk")
    val nChars16 = s.length
    if (nChars16 == 0) return Array.emptyIntArray
    val win = new Array[Long](W)
    // worst case every position from W on is a boundary, plus the end
    val buf = new Array[Int](math.max(nChars16 + 1, W + 1))
    var cnt = 0
    var ci = 0 // UTF-16 index
    var pos = 0 // 1-based code-point position of the char just read
    while (ci < nChars16) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      pos += 1
      win(pos % W) = cp.toLong
      if (pos >= W) {
        var h = 0L
        var j = 0
        while (j < W) { h += win((pos - j) % W) * pows(j); j += 1 }
        if (h % Mod % avgChunk == 0) { buf(cnt) = pos; cnt += 1 }
      }
    }
    if (cnt == 0 || buf(cnt - 1) != pos) { buf(cnt) = pos; cnt += 1 }
    java.util.Arrays.copyOf(buf, cnt)
  }

  /** Register on a session; afterwards use [[col]] or SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => CdcBoundaries(exprs(0), exprs(1)), "scala_udf")

  /** Column API (requires [[register]] — `Graft.session` does it). */
  def col(text: Column, avgChunk: Column): Column =
    org.apache.spark.sql.functions.call_function(NAME, text, avgChunk)
}

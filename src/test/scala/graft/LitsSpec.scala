package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Lits

/** Reflection-free array/matrix literals (functions/Lits): same value
  * and element types as typedLit, one folded literal node, usable by
  * the codegen expressions that consume foldable arrays.
  */
class LitsSpec extends GraftSuite {

  test("doubles/floats literal: value and element type match typedLit") {
    val df = spark.range(1).select(
      Lits.doubles(Seq(1.5, 2.5)).as("d"),
      Lits.floats(Seq(1.5f, -2.5f)).as("f"),
      typedLit(Seq(1.5, 2.5)).as("td"))
    // runtime inference marks containsNull=true (typedLit: false) —
    // every consumer pattern-matches ArrayType(T, _), so only the
    // element type is contractual
    (df.schema("d").dataType, df.schema("td").dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) => assert(a === b)
      case other => fail(s"unexpected types: $other")
    }
    val r = df.first()
    assert(r.getSeq[Double](0) === Seq(1.5, 2.5))
    assert(r.getSeq[Float](1) === Seq(1.5f, -2.5f))
  }

  test("matrix and cube literals fold to ONE literal node (no per-element expressions)") {
    val m = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))
    val df = spark.range(1).select(Lits.floatMatrix(m).as("m"),
      Lits.floatCube(Seq(m, m)).as("c"))
    val lits = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal => l
    })
    assert(lits.length === 2, s"expected exactly two folded literals, got: $lits")
    val got = df.first().getAs[scala.collection.Seq[scala.collection.Seq[Float]]](0)
    assert(got.map(_.toSeq).toSeq === m)
  }

  test("a Lits matrix drives the MatVec codegen expression like typedLit did") {
    graft.functions.MatVec.register(spark)
    val out = spark.range(1)
      .select(Lits.floats(Seq(3.0f, 4.0f)).as("v"))
      .select(call_function(graft.functions.MatVec.NAME, col("v"),
        Lits.floatMatrix(Seq(Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))).as("y"))
      .first().getSeq[Float](0)
    assert(out === Seq(3.0f, 8.0f))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Array/matrix literal Columns WITHOUT `typedLit`: `typedLit`
  * resolves an encoder through TypeTag reflection, which can fall
  * back to an unsupported raw literal under exotic classloaders
  * (REPL/notebook — the failure `skipGramPairs` hit and worked around
  * with `array(lit..)`). `array(lit..)` in turn builds O(n) expression
  * nodes — wrong for the 4096×64 centroid matrices the ANN tier
  * folds. Spark 4's `lit(Any)` routes Seq/Array values through the
  * ColumnNode literal converter with runtime type inference — no
  * TypeTag, one Literal node, the same plan shape `typedLit` produces
  * on its happy path (LitsSpec pins value, schema, and foldability).
  * These wrappers exist to keep call sites explicit about intent and
  * to give the no-reflection guarantee one audited home.
  */
object Lits {

  def doubles(xs: Seq[Double]): Column = lit(xs.toArray)

  def floats(xs: Seq[Float]): Column = lit(xs.toArray)

  def floatMatrix(m: Seq[Seq[Float]]): Column = lit(m.map(_.toArray).toArray)

  def floatCube(c: Seq[Seq[Seq[Float]]]): Column =
    lit(c.map(_.map(_.toArray).toArray).toArray)
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: injects graft's native functions so any
  * session created with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` on a
  * cluster — gets them in both the Column and SQL surfaces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSim.NAME),
      new ExpressionInfo(classOf[CosineSim].getName, CosineSim.NAME),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(DotFloat.NAME),
      new ExpressionInfo(classOf[DotFloat].getName, DotFloat.NAME),
      (exprs: Seq[Expression]) => DotFloat(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(NearestCell.NAME),
      new ExpressionInfo(classOf[NearestCell].getName, NearestCell.NAME),
      (exprs: Seq[Expression]) => NearestCell(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(NearestCells.NAME),
      new ExpressionInfo(classOf[NearestCells].getName, NearestCells.NAME),
      (exprs: Seq[Expression]) => NearestCells(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier(MatVec.NAME),
      new ExpressionInfo(classOf[MatVec].getName, MatVec.NAME),
      (exprs: Seq[Expression]) => MatVec(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(PqLut.NAME),
      new ExpressionInfo(classOf[PqLut].getName, PqLut.NAME),
      (exprs: Seq[Expression]) => PqLut(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(SortedIntersectCount.NAME),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, SortedIntersectCount.NAME),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(CdcBoundaries.NAME),
      new ExpressionInfo(classOf[CdcBoundaries].getName, CdcBoundaries.NAME),
      (exprs: Seq[Expression]) => CdcBoundaries(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.EliminateUnusedUniqueJoin)
  }
}

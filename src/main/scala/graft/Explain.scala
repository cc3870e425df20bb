package graft

import graft.queries.Catalog

/** Plan probe: print the executed plan of a named catalog query over
  * a given sf dir — the `.explain` loop for catching plan flips
  * (broadcast→SMJ, lost pushdowns) when the data scales.
  *
  * Usage: runMain graft.Explain <queryName> <sfDir> [maxChars] [mode]
  * mode = simple (default, executedPlan) | formatted (the
  * `.explain("formatted")` output the plans/ dossier commits).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir  = args(1)
    val max  = if (args.length > 2) args(2).toInt else 6000
    val mode = if (args.length > 3) args(3) else "simple"
    val spark = graft.core.Graft.session("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val qe = Catalog.byName(name).build(spark, dir).queryExecution
    val plan =
      if (mode == "formatted")
        qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      else qe.executedPlan.toString
    println(plan.take(max))
    spark.stop()
  }
}

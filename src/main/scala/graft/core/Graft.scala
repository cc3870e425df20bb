package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Central place for the configuration that matters at scale: shuffle
  * partition sizing, AQE (runtime re-planning + skew-join handling),
  * and UTC session time zone (oracle parity). On a real cluster the
  * same builder is used with `master` unset (spark-submit provides it).
  */
object Graft {

  /** Number of local cores to use when no master is configured. */
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def session(appName: String = "graft", cpus: String = defaultCpus): SparkSession = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // local[n]: shuffle partitions = cores, not the 200 default.
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE: runtime coalescing of small shuffle partitions and skew
      // join splitting — both essential at 100 TB and harmless locally.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerFunctions(spark)
    // custom optimizer rules (the extensions path on a cluster);
    // appended idempotently — getOrCreate may return a reused session
    // where the user (or another library) already installed rules
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(graft.plans.EliminateUnusedUniqueJoin))
      spark.experimental.extraOptimizations =
        existing :+ graft.plans.EliminateUnusedUniqueJoin
    spark
  }

  /** Register graft's native functions on an existing session (the
    * cluster path is `spark.sql.extensions=graft.functions.
    * GraftExtensions`; this covers sessions built elsewhere, e.g. the
    * driver's Verify/Bench mains).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.CosineSim.register(spark)
    graft.functions.DotFloat.register(spark)
    graft.functions.NearestCell.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    graft.functions.SortedIntersect.register(spark)
    graft.functions.CdcBoundaries.register(spark)
  }
}

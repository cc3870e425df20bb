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
      // Coalescing floor (r16 optimization, guide §2.2/§2.5): AQE
      // sizes post-shuffle partitions by SHUFFLE BYTES, which is blind
      // to downstream per-row amplification — a small exchange feeding
      // an explosive stage (band/wedge self-joins, sorted-adjacency
      // intersects, co-purchase pair generation) gets coalesced to a
      // handful of tasks and runs a multi-second CPU stage on 1/3 of
      // the machine (measured: the q_tri_local intersect stage at 6 of
      // 32 tasks, 13.7 s executor time behind a 9 MB exchange). The
      // default 1 MB minPartitionSize floor is what bites; 256 KB keeps
      // tiny-but-hot exchanges parallel. 256 KB, not lower, BY SWEEP
      // (64 KB / 256 KB / 1 MB probed on the two extremes): per-task
      // fixed cost makes sub-256 KB partitions a net loss on
      // latency-class iterative queries (q_graph_hits median 5.6 s at
      // 64 KB vs 3.6 s at 256 KB ≈ 1 MB), while the CPU-heavy
      // small-exchange stages keep their win (q_tri_local 3.9 s at
      // 256 KB vs 6.9 s at 1 MB). Scale-safe by construction: the
      // floor only matters when a shuffle carries less than
      // cores×1 MB — production shuffles never do, and the
      // bytes-per-partition target still governs them. Env-overridable
      // for deployments that want the stock floor back.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED_PARTITION_BYTES", "262144"))
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

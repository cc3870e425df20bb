package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The type-dictionary surface — the reference's "Model": bidirectional
  * name⇄id lookups for node types, edge types, and property types,
  * created lazily on first use (HGraphStorage Types.hs:335-355,
  * API.hs:471-490; STMGraph Raw.hs:352-367). Property types are
  * identified by (name, dataType) pairs — the same name with two
  * datatypes is two entries (Types.hs:338).
  *
  * In the Spark engine labels stay strings in the public API (parquet
  * dictionary-encodes them); the model table exists as queryable
  * metadata and broadcast-joinable dimension, derived from the
  * snapshot itself — so it can never drift from the data.
  */
object Model {

  /** Derive the model table from a snapshot: one row per (kind, name[,
    * dataType]), ids assigned by first-seen name order (dense ranks
    * over sorted names — deterministic).
    */
  def fromSnapshot(spark: SparkSession, g: GraphSnapshot): DataFrame = {
    val live = g.live
    // The unpartitioned window funnels the dictionary through one
    // partition — intentional: a dictionary is distinct labels/prop
    // names (dozens of rows by construction, never corpus-sized), and
    // global ids require a global order. The corpus-sized work
    // (distinct) happens BEFORE the window, fully parallel.
    def dict(kind: String, names: DataFrame): DataFrame =
      names.distinct()
        .withColumn("id", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("name"), col("dataType"))))
        .select(lit(kind).as("kind"), col("id"), col("name"), col("dataType"))

    val nodeTypes = dict("node", live.nodes.select(col("label").as("name"),
      lit(null).cast("byte").as("dataType")))
    val edgeTypes = dict("edge", live.edges.select(col("label").as("name"),
      lit(null).cast("byte").as("dataType")))
    // property types: every (name, vType) pair used anywhere
    def propTypes(df: DataFrame) = df
      .select(explode(col("props")).as(Seq("name", "vals")))
      .select(col("name"), explode(col("vals")).as("v"))
      .select(col("name"), col("v.vType").as("dataType"))
    val props = dict("prop", propTypes(live.nodes).unionAll(propTypes(live.edges)))
    nodeTypes.unionAll(edgeTypes).unionAll(props)
  }

  /** Persist / load the dictionary next to the snapshot tables
    * (readModel/writeModel, FileOps.hs:113-148).
    */
  def write(model: DataFrame, dir: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(s"$dir/model")

  /** The CURRENT dictionary: the base parquet plus every committed
    * get-or-create segment, ids reassigned deterministically over the
    * merged name set. With no segments this is exactly the base.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readWithSegments(spark, dir, segmentNames(dir))

  /** Driver-side name→id map for one kind (broadcast by callers). */
  def lookup(model: DataFrame, kind: String): Map[String, Int] =
    model.filter(col("kind") === kind).select("name", "id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  // ---- concurrent get-or-create (STMGraph RawSpec.hs:60-76 conformance) ----
  //
  // The reference proves 10 async writers x 25 get-or-create ops
  // converge to one bijective dictionary. The engine's analog: each
  // writer appends its MISSING names as an immutable segment file
  // (unique name, atomic tmp+rename via Sidecar — the StagedCommit
  // commit primitive), and ids are a PURE FUNCTION of the merged name
  // set (dense rank per kind over sorted (name, dataType), the
  // fromSnapshot scheme). Concurrent writers can interleave freely:
  // segments never overwrite each other, duplicated names collapse in
  // the distinct, and both sessions read the same converged mapping —
  // no lock, no lost types, no torn ids.

  private def segDir(dir: String) = s"$dir/model_segments"
  private def segmentNames(dir: String): Seq[String] =
    Sidecar.listNames(segDir(dir)).filter(_.startsWith("seg-")).sorted

  /** id assignment over a (kind, name, dataType) bag — dense ranks
    * per kind over sorted names, the [[fromSnapshot]] contract: ids
    * depend only on the SET, never on arrival interleaving.
    */
  private def assignIds(names: DataFrame): DataFrame =
    names.distinct()
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("kind"))
          .orderBy(col("name"), col("dataType"))))
      .select(col("kind"), col("id"), col("name"), col("dataType"))

  private def parseSegment(content: String): Seq[(String, String, Option[Byte])] =
    content.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val f = line.split('\t')
      (f(0), f(1), if (f.length > 2 && f(2).nonEmpty) Some(f(2).toByte) else None)
    }

  private def readWithSegments(spark: SparkSession, dir: String,
      segs: Seq[String]): DataFrame = {
    import spark.implicits._
    val base: Option[DataFrame] =
      if (Sidecar.exists(s"$dir/model")) Some(spark.read.parquet(s"$dir/model")) else None
    if (segs.isEmpty)
      return base.getOrElse(
        Seq.empty[(String, Int, String, Option[Byte])].toDF("kind", "id", "name", "dataType"))
    val segRows = segs
      .flatMap(n => Sidecar.readString(s"${segDir(dir)}/$n").toSeq.flatMap(parseSegment))
      .toDF("kind", "name", "dataType")
      .select(col("kind"), col("name"), col("dataType").cast("byte"))
    val names = base.fold(segRows)(b =>
      b.select(col("kind"), col("name"), col("dataType")).unionAll(segRows))
    assignIds(names)
  }

  /** Get-or-create `entries` (kind, name, dataType) against the store
    * at `dir`: names already present are untouched; missing ones
    * commit as ONE atomic segment. Returns the dictionary as of this
    * call (a concurrent writer may grow it further — re-read for the
    * latest view; convergence is ModelConcurrencySpec's contract).
    */
  def getOrCreate(spark: SparkSession, dir: String,
      entries: Seq[(String, String, Option[Byte])]): DataFrame = {
    entries.foreach { case (k, n, _) =>
      require(!k.contains('\t') && !n.contains('\t') && !k.contains('\n') && !n.contains('\n'),
        s"model names must not contain tabs/newlines: ($k, $n)")
    }
    val current = read(spark, dir)
      .select(col("kind"), col("name"), col("dataType"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getByte(2)))).toSet
    val missing = entries.distinct.filterNot(current)
    if (missing.nonEmpty) {
      val content = missing.map { case (k, n, dt) =>
        s"$k\t$n\t${dt.map(_.toString).getOrElse("")}"
      }.mkString("\n")
      Sidecar.writeString(
        s"${segDir(dir)}/seg-${java.util.UUID.randomUUID().toString}", content)
    }
    read(spark, dir)
  }

  /** Fold committed segments into the base parquet. Safe against
    * concurrent get-or-create: only the segments MERGED here are
    * deleted, and a crash between write and delete just re-folds the
    * (idempotent, distinct-collapsed) survivors at next read.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val segs = segmentNames(dir)
    if (segs.isEmpty) return
    val merged = readWithSegments(spark, dir, segs).localCheckpoint()
    write(merged, dir)
    segs.foreach(n => Sidecar.delete(s"${segDir(dir)}/$n"))
  }
}

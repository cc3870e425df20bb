package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NearestCell

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
  * corpus into nlist cells; a query probes only its nprobe nearest
  * cells. The complement to [[Similarity.lshBucket]]: data-adaptive
  * cells instead of data-oblivious hyperplanes.
  *
  * Scale shape: training touches the corpus iters+1 times (assignment
  * is a scan with nlist fused dot products per row — no shuffle;
  * the centroid update is one groupBy over (cell, dim)). The trained
  * centroids are KBs-to-MBs on the driver and enter the plan as ONE
  * matrix literal inside [[NearestCell]] — the expression tree and
  * generated code stay O(1) in nlist, so realistic cell counts
  * (4k-64k) neither blow up the plan nor hit Janino limits. Search is
  * a partition-prunable cell filter + in-cell top-k. At 100 TB the
  * corpus is written bucketed/partitioned by `cell` so a probe reads
  * only nprobe/nlist of the data.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[Array[Float]]) {
    def nlist: Int = centroids.length
  }

  /** Cell assignment: argmin_c ||v - c||² = argmin_c (|c|² - 2 v·c).
    * Ties break to the lower cell id (first-wins scan order). One
    * codegen'd expression regardless of nlist; requires
    * [[NearestCell.register]] (done by [[train]]/[[topK]]).
    */
  def assign(vec: Column, index: IvfIndex): Column =
    NearestCell.col(vec, index.centroids)

  /** Lloyd's algorithm with deterministic init (the first nlist
    * vectors in id order). Centroid averages are exact enough that
    * ulp-level shuffle nondeterminism cannot move assignments except
    * for exactly equidistant vectors.
    */
  def train(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): IvfIndex = {
    NearestCell.register(spark)
    var centroids = emb.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)

    (1 to iters).foreach { _ =>
      val assigned = emb.select(col(vecCol).as("v"), assign(col(vecCol), IvfIndex(centroids)).as("cell"))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      centroids = next
    }
    IvfIndex(centroids)
  }

  /** Cells in probe order for `query`: ascending distance to the
    * centroid, ties to the lower cell id. Driver-side over the KB-MB
    * centroid matrix — the probe list enters the plan as a literal.
    */
  def probeOrder(index: IvfIndex, query: Array[Float]): Seq[Int] = {
    val q2 = (c: Array[Float]) => {
      var d = 0.0; var i = 0
      while (i < c.length) { d += (query(i).toDouble - c(i)) * (query(i).toDouble - c(i)); i += 1 }
      d
    }
    index.centroids.zipWithIndex.sortBy { case (c, i) => (q2(c), i) }.map(_._2).toSeq
  }

  /** Search: probe the query's nprobe nearest cells, cosine top-k
    * within them (native expression), deterministic ordering. Assigns
    * cells over the full corpus at query time — correct anywhere, but
    * the scale path is [[writePartitioned]] + [[topKPartitioned]],
    * where the probe filter prunes at the FILE level.
    */
  def topK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      index: IvfIndex, query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    graft.functions.CosineSim.register(spark)
    NearestCell.register(spark)
    val probeCells = probeOrder(index, query).take(nprobe)
    emb
      .withColumn("cell", assign(col(vecCol), index))
      .filter(col("cell").isin(probeCells: _*))
      .withColumn("cos", round(graft.functions.CosineSim.col(col(vecCol), typedLit(query.toSeq)), 6))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"), col("cell"))
  }

  /** Publish the corpus PARTITIONED BY trained cell id — the ANN
    * analog of [[graft.core.GraphSnapshot.writeBucketed]] and the
    * missing half of the Ivf scale story: cell assignment happens ONCE
    * at publish time, and a probe then reads only nprobe/nlist of the
    * files via partition pruning (reference intent: ID→offset O(1)
    * access, HGraphStorage FileOps.hs:153-169 — here cell→directory).
    * At 100 TB add bucketing within cells; the pruning mechanics are
    * identical.
    */
  /** Fingerprint of the centroid matrix, stored as a sidecar in the
    * published layout so appends can detect an index/layout mismatch.
    */
  private def fingerprint(index: IvfIndex): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bb = java.nio.ByteBuffer.allocate(4)
    index.centroids.foreach(_.foreach { f =>
      bb.clear(); bb.putFloat(f); md.update(bb.array()) })
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  private def fingerprintPath(path: String) =
    java.nio.file.Paths.get(path, "_ivf_centroids.sha")

  def writePartitioned(emb: DataFrame, vecCol: String, index: IvfIndex, path: String): Unit = {
    emb.withColumn("cell", assign(col(vecCol), index))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    java.nio.file.Files.writeString(fingerprintPath(path), fingerprint(index))
  }

  /** Append a batch to a published cell-partitioned corpus WITHOUT
    * retraining or rewriting: assign the batch with the SAME
    * base-trained centroids and append its files into the matching
    * cell directories. O(batch) work per ingestion — the ANN analog
    * of the dedup band-index append and the streaming delta sink.
    * Probes see appended vectors immediately (partition listing picks
    * up new files). Centroids deliberately do NOT move: retrain +
    * republish when drift degrades recall, exactly like periodic
    * delta compaction.
    */
  def appendPartitioned(newEmb: DataFrame, vecCol: String, index: IvfIndex, path: String): Unit = {
    // guard the documented failure mode: retraining after drift and
    // then APPENDING with the new index would mix two cell geometries
    // in one layout — probes at nprobe < nlist silently lose recall.
    // The publish-time fingerprint makes that an error, not a mystery.
    val fp = fingerprintPath(path)
    if (java.nio.file.Files.exists(fp)) {
      val published = java.nio.file.Files.readString(fp)
      require(published == fingerprint(index),
        s"IVF index mismatch: layout at $path was published with centroids " +
          s"$published but the append uses ${fingerprint(index)} — after a " +
          "retrain, republish with writePartitioned instead of appending")
    }
    newEmb.withColumn("cell", assign(col(vecCol), index))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Search over a published cell-partitioned corpus. The probe-cell
    * filter is a PARTITION filter — only the probed directories are
    * listed and read (IvfSpec pins selectedPartitions == nprobe) — and
    * [[NearestCell]] is never evaluated at query time. `pred` is an
    * extra row filter applied before the top-k (pushed to the scan).
    */
  def topKPartitioned(spark: SparkSession, path: String, idCol: String, vecCol: String,
      index: IvfIndex, query: Array[Float], k: Int, nprobe: Int,
      pred: Column = lit(true)): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val probeCells = probeOrder(index, query).take(nprobe)
    spark.read.parquet(path)
      .filter(col("cell").isin(probeCells: _*) && pred)
      .withColumn("cos", round(graft.functions.CosineSim.col(col(vecCol), typedLit(query.toSeq)), 6))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"), col("cell"))
  }
}

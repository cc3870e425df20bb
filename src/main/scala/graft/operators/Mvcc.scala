package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MVCC over version-columned DataFrames — the LowLevelDB transaction
  * surface (MVCC.hs:104-108, 228-298) re-expressed as pure Catalyst
  * predicates over `tx_min`/`tx_max` columns on immutable snapshots.
  *
  * Every logical row is a chain of versions: `tx_min` = creating
  * transaction, `tx_max` = deleting transaction (null = live). This is
  * the natural fit for append-only parquet: an UPDATE closes the old
  * version and appends a new one (copy-on-write), a DELETE just
  * closes. No custom execution — the visibility check is a single
  * codegen-friendly boolean expression, so it pushes into scans and
  * costs nothing at 100 TB.
  */
object Mvcc {

  /** PostgreSQL-style snapshot visibility (MVCC.hs:286-298):
    * a version is visible to transaction `tx` given a set of
    * transactions committed before `tx` started iff
    *   - its creator is `tx` itself or a committed transaction, AND
    *   - it is not deleted, or its deleter is a different,
    *     uncommitted transaction.
    *
    * The delete check is identical for self-created and committed
    * rows: a row `tx` created but some *other uncommitted* tx deleted
    * stays visible until that deleter commits (PG semantics).
    *
    * `committed` maps a tx-id column to a boolean column (broadcast
    * set membership or a monotonic `< snapshotTx` bound).
    */
  def visible(tx: Long, committed: Column => Column): Column = {
    val txMin = col("tx_min")
    val txMax = col("tx_max")
    (txMin === tx || committed(txMin)) &&
      (txMax.isNull || (txMax =!= tx && !committed(txMax)))
  }

  /** Visibility for the common serial history: every tx with a lower
    * id committed before `tx` began (MVCCSpec's serialized scenarios).
    */
  def visibleAt(tx: Long): Column = visible(tx, c => c < tx)

  /** Snapshot read (readRecord, MVCC.hs:271-275). */
  def readAsOf(versioned: DataFrame, tx: Long): DataFrame =
    versioned.filter(visibleAt(tx))

  /** Begin a versioned table: stamp unversioned rows as created by
    * `tx` (bulk-load analog).
    */
  def init(df: DataFrame, tx: Long): DataFrame =
    df.withColumn("tx_min", lit(tx)).withColumn("tx_max", lit(null).cast("long"))

  /** writeRecord (MVCC.hs:228-248) as a copy-on-write transform:
    * visible rows matching `pred` get closed (`tx_max = tx`) and a
    * transformed copy appended with `tx_min = tx`. `mutate` maps the
    * matched rows to their new values (same schema, pre-version cols).
    */
  def update(versioned: DataFrame, pred: Column, tx: Long,
      mutate: DataFrame => DataFrame): DataFrame = {
    val vis     = visibleAt(tx)
    val hit     = vis && pred
    val closed  = versioned.withColumn("tx_max", when(hit, lit(tx)).otherwise(col("tx_max")))
    val dataCols = versioned.columns.filterNot(c => c == "tx_min" || c == "tx_max")
    val fresh = mutate(versioned.filter(hit).selectExpr(dataCols.toIndexedSeq: _*))
      .withColumn("tx_min", lit(tx))
      .withColumn("tx_max", lit(null).cast("long"))
      .select(versioned.columns.toIndexedSeq.map(col): _*)
    closed.unionAll(fresh)
  }

  /** deleteRecord (MVCC.hs:251-268): close matching visible versions. */
  def delete(versioned: DataFrame, pred: Column, tx: Long): DataFrame =
    versioned.withColumn("tx_max",
      when(visibleAt(tx) && pred, lit(tx)).otherwise(col("tx_max")))

  /** Compaction (the snapshot-file analog of the reference's
    * free-space defrag, SURVEY §4): drop versions invisible to every
    * snapshot at or after `horizon` — rows deleted before the oldest
    * reader anyone still needs. Visibility for tx >= horizon is
    * unchanged; storage shrinks by the dead-version count. Run as a
    * maintenance rewrite of the snapshot files.
    */
  def compact(versioned: DataFrame, horizon: Long): DataFrame =
    versioned.filter(col("tx_max").isNull || col("tx_max") >= horizon)

  /** Physically purge rolled-back transactions (the data half of the
    * reference's `deleteTx`, MVCC.hs:301-312): versions an aborted tx
    * STAGED (`tx_min` aborted) are dropped — [[compact]] never touches
    * them, their `tx_max` is null — and versions an aborted tx CLOSED
    * (`tx_max` aborted) are re-opened, undoing the staged delete.
    * After the rewrite is durable no row references the aborted ids,
    * so their abort markers can be dropped
    * ([[TxLog.purgeAborted]] composes the two) — visibility for every
    * live reader is unchanged because an aborted id never satisfies
    * the committed predicate anyway. `aborted` is driver-bounded (the
    * retained abort list, in-flight-window sized — see the TxLog class
    * note), so the predicate is two `isin`s, codegen-friendly.
    */
  def purgeAborted(versioned: DataFrame, aborted: Set[Long]): DataFrame = {
    if (aborted.isEmpty) return versioned
    val ids = aborted.toSeq
    versioned
      .filter(!col("tx_min").isin(ids: _*))
      .withColumn("tx_max",
        when(col("tx_max").isin(ids: _*), lit(null).cast("long")).otherwise(col("tx_max")))
  }

  /** Cascading node delete (APITest.hs:55-68 semantics): closing a
    * node version also closes every live incident edge — the
    * reference's chain-repair walk (API.hs:363-429) becomes one
    * predicate over the edge endpoints.
    */
  def deleteNodeCascade(nodes: DataFrame, edges: DataFrame, nodePred: Column, tx: Long)
      : (DataFrame, DataFrame) = {
    val closedNodes = delete(nodes, nodePred, tx)
    val victims = nodes.filter(visibleAt(tx) && nodePred)
      .select(col("id").as("__vid")).distinct()
    // two equi-joins (src, dst) rather than one OR-join: an OR-join
    // would duplicate edges whose both endpoints die, and equi-joins
    // stay broadcast-hash at scale
    val closedEdges = edges
      .join(broadcast(victims.withColumnRenamed("__vid", "__s")), col("src") === col("__s"), "left")
      .join(broadcast(victims.withColumnRenamed("__vid", "__d")), col("dst") === col("__d"), "left")
      .withColumn("tx_max",
        when(visibleAt(tx) && (col("__s").isNotNull || col("__d").isNotNull), lit(tx))
          .otherwise(col("tx_max")))
      .drop("__s", "__d")
    (closedNodes, closedEdges)
  }
}

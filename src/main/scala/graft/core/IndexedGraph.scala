package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Mvcc, UniqueIndex}
import graft.operators.UniqueIndex.IndexInfo

/** A graph snapshot plus its maintained secondary indexes — the
  * reference's full mutation surface (HGraphStorage API.hs:156-238),
  * where every object write first diffs old vs new indexed values,
  * removes stale entries, duplicate-checks, and only then inserts the
  * new ones. Here each mutation returns a new `IndexedGraph` whose
  * index frames were maintained incrementally via
  * [[UniqueIndex.maintain]]: the diff runs over the TOUCHED rows only
  * (pre/post images of the matched nodes), so maintenance cost scales
  * with the mutation, not the corpus — the property a trie gives the
  * reference per-object, re-expressed as a bounded DataFrame diff.
  *
  * Conformance: APITest.hs:128-174 ("Indexing one object" /
  * "Indexing two objects") — create→entry appears, update→old key
  * removed + new inserted, delete→entries gone.
  */
final case class IndexedGraph(graph: GraphSnapshot, indexes: Map[IndexInfo, DataFrame]) {

  /** addIndex backfill over existing live rows (API.hs:494-516). */
  def withIndex(info: IndexInfo): IndexedGraph =
    copy(indexes = indexes +
      (info -> UniqueIndex.build(graph.nodes.filter(col("tx_max").isNull), info)))

  private def touchedAt(pred: Column, tx: Long): DataFrame =
    graph.nodes.filter(Mvcc.visibleAt(tx) && pred)

  /** COW property update + index maintenance (updateObject,
    * API.hs:170-180). Raises
    * [[UniqueIndex.DuplicateIndexKeyException]] if a unique index
    * would gain a key another live object already owns — before any
    * index is modified.
    */
  def updateNodeProps(pred: Column, tx: Long, mutateProps: Column => Column): IndexedGraph = {
    val before = touchedAt(pred, tx)
    val after  = before.withColumn("props", mutateProps(col("props")))
    IndexedGraph(
      graph.updateNodeProps(pred, tx, mutateProps),
      indexes.map { case (info, idx) => info -> UniqueIndex.maintain(idx, before, after, info) })
  }

  /** Cascading node delete + index maintenance (deleteObject,
    * API.hs:410-429): an empty after-image removes every entry the
    * victims owned (APITest.hs:141-157).
    */
  def deleteNodes(pred: Column, tx: Long): IndexedGraph = {
    val before = touchedAt(pred, tx)
    IndexedGraph(
      graph.deleteNodes(pred, tx),
      indexes.map { case (info, idx) =>
        info -> UniqueIndex.maintain(idx, before, before.limit(0), info) })
  }
}

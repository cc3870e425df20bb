package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Sidecar

/** Persisted transaction manager beside a versioned table — the
  * LowLevelDB persisted committed-set analog (MVCC.hs:161-217, which
  * keeps the committed transactions in an on-disk trie so ANY session
  * opening the store resolves visibility). The engine's committed set
  * was previously an in-memory predicate argument
  * ([[Mvcc.visible]]'s `committed`); this log makes it a function of
  * the STORE, so session B opening cold sees exactly what session A
  * committed.
  *
  * Layout under `dir/txlog/`:
  *  - `alloc-<id>` — claimed tx ids ([[begin]] via exclusive create:
  *    two sessions can never share an id);
  *  - `commit-<id>` — the COMMIT POINT, one atomic marker per
  *    committed tx (rollback = simply never writing it);
  *  - `watermark` — every tx `<= w` is committed ([[compact]] folds
  *    the contiguous committed prefix here and deletes its markers —
  *    the xmin-horizon trick, so the marker set stays bounded by the
  *    IN-FLIGHT window, not history: at 100 TB the predicate is one
  *    `<=` plus an `isin` over recent ids, never a billion-row set).
  */
object TxLog {

  private def txDir(dir: String) = s"$dir/txlog"

  private def idsWithPrefix(dir: String, prefix: String): Seq[Long] =
    Sidecar.listNames(txDir(dir)).collect {
      case n if n.startsWith(prefix) => n.stripPrefix(prefix).toLong
    }

  /** Watermark: every tx id <= this is committed (0 = none). */
  def watermark(dir: String): Long =
    Sidecar.readString(s"${txDir(dir)}/watermark").map(_.trim.toLong).getOrElse(0L)

  /** Allocate a fresh tx id: claim max-known + 1 by exclusive marker
    * create, retrying upward on collision — two concurrent sessions
    * always get distinct ids.
    */
  def begin(dir: String): Long = {
    val known = (idsWithPrefix(dir, "alloc-") ++ idsWithPrefix(dir, "commit-") :+
      watermark(dir)).max
    var id = known + 1
    while (!Sidecar.createExclusive(s"${txDir(dir)}/alloc-$id")) id += 1
    id
  }

  /** THE commit point: one atomic marker. Idempotent. */
  def commit(dir: String, tx: Long): Unit =
    Sidecar.writeString(s"${txDir(dir)}/commit-$tx", "")

  /** The committed set above the watermark plus the watermark itself
    * (`(w, recentIds)`): the compact representation every reader
    * needs.
    */
  def committedState(dir: String): (Long, Set[Long]) = {
    val w = watermark(dir)
    (w, idsWithPrefix(dir, "commit-").filter(_ > w).toSet)
  }

  def isCommitted(dir: String, tx: Long): Boolean = {
    val (w, recent) = committedState(dir)
    tx <= w || recent(tx)
  }

  /** The committed-set membership predicate for [[Mvcc.visible]]:
    * one comparison against the watermark plus an `isin` over the
    * in-flight window — codegen-friendly, size-bounded.
    */
  def committedColumn(dir: String): Column => Column = {
    val (w, recent) = committedState(dir)
    c => if (recent.isEmpty) c <= w else c <= w || c.isin(recent.toSeq: _*)
  }

  /** Cross-session snapshot read: [[Mvcc.visible]] with the
    * PERSISTED committed set — session B's view of what session A
    * committed (MVCC.hs:271-275 over the on-disk manager).
    */
  def visibleStore(dir: String, tx: Long): Column =
    Mvcc.visible(tx, committedColumn(dir))

  /** Advance the watermark over the contiguous committed prefix and
    * drop its markers (plus allocation markers at or below it). A
    * crash mid-delete leaves markers `<= w`, which [[committedState]]
    * already ignores — re-running finishes the cleanup. Never
    * advances past a gap: an in-flight (allocated, uncommitted) tx
    * keeps everything above it in the marker set.
    */
  def compact(dir: String): Unit = {
    val w0 = watermark(dir)
    val committed = idsWithPrefix(dir, "commit-").filter(_ > w0).sorted
    var w = w0
    for (id <- committed if id == w + 1) w = id
    if (w > w0) Sidecar.writeString(s"${txDir(dir)}/watermark", w.toString)
    idsWithPrefix(dir, "commit-").filter(_ <= w)
      .foreach(id => Sidecar.delete(s"${txDir(dir)}/commit-$id"))
    idsWithPrefix(dir, "alloc-").filter(_ <= w)
      .foreach(id => Sidecar.delete(s"${txDir(dir)}/alloc-$id"))
  }
}

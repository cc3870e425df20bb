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
  *    committed tx;
  *  - `abort-<id>` — explicit rollback (the LowLevelDB `deleteTx`
  *    analog, MVCC.hs:301-312): resolves the id so [[compact]]'s
  *    watermark can advance past it instead of being wedged forever
  *    by one abandoned transaction. Abort markers are retained (the
  *    permanent exception list — see the watermark note below);
  *  - `watermark` — every tx `<= w` is RESOLVED (committed or
  *    aborted); committed means `<= w` and not in the abort list
  *    ([[compact]] folds the contiguous resolved prefix here and
  *    deletes the commit/alloc markers — the xmin-horizon trick, so
  *    the live marker set stays bounded by the IN-FLIGHT window, not
  *    history: at 100 TB the predicate is one `<=` plus `isin`s over
  *    recent ids and the abort list, never a billion-row set).
  *
  * Abort markers cannot be horizon-folded like commit markers: a
  * rolled-back transaction may have already APPENDED versions stamped
  * `tx_min = id` (the COW write path stages data before the commit
  * point), and the abort marker is the only thing keeping them
  * invisible. They are dropped by [[forgetAborted]] once the caller
  * has physically purged those versions (the [[Mvcc.compact]]
  * maintenance rewrite) — abort count, not history, bounds the set.
  */
object TxLog {

  private def txDir(dir: String) = s"$dir/txlog"

  private def idsWithPrefix(dir: String, prefix: String): Seq[Long] =
    Sidecar.listNames(txDir(dir)).collect {
      case n if n.startsWith(prefix) => n.stripPrefix(prefix).toLong
    }

  /** Watermark: every tx id <= this is resolved (committed or in the
    * abort list; 0 = none).
    */
  def watermark(dir: String): Long =
    Sidecar.readString(s"${txDir(dir)}/watermark").map(_.trim.toLong).getOrElse(0L)

  /** Allocate a fresh tx id: claim max-known + 1 by exclusive marker
    * create, retrying upward on collision — two concurrent sessions
    * always get distinct ids.
    */
  def begin(dir: String): Long = {
    val known = (idsWithPrefix(dir, "alloc-") ++ idsWithPrefix(dir, "commit-") ++
      idsWithPrefix(dir, "abort-") :+ watermark(dir)).max
    var id = known + 1
    while (!Sidecar.createExclusive(s"${txDir(dir)}/alloc-$id")) id += 1
    id
  }

  /** THE commit point: one atomic marker. Idempotent. Committing a
    * rolled-back transaction is a caller bug — fail loud, never let
    * both markers exist.
    *
    * Both-markers convergence: the pre-check and the marker write are
    * not one atomic step, so a janitor ([[abortStale]]) or a racing
    * [[abort]] can land its marker in between. Each writer therefore
    * RE-CHECKS for the opposing marker after writing its own and backs
    * off (deletes its marker, fails loud) if it finds one — the
    * Dekker-style second-writer-yields rule. In every interleaving at
    * most one marker survives, a commit() that RETURNED SUCCESS is
    * never silently overridden by an abort, and the symmetric
    * both-back-off case leaves the tx unresolved (loud commit failure;
    * the janitor re-aborts it on a later pass). TxLogSpec races the
    * pair and asserts the invariant.
    */
  def commit(dir: String, tx: Long): Unit = {
    if (Sidecar.exists(s"${txDir(dir)}/abort-$tx"))
      throw new IllegalStateException(s"tx $tx was rolled back; cannot commit")
    Sidecar.writeString(s"${txDir(dir)}/commit-$tx", "")
    if (Sidecar.exists(s"${txDir(dir)}/abort-$tx")) {
      Sidecar.delete(s"${txDir(dir)}/commit-$tx")
      throw new IllegalStateException(
        s"tx $tx was rolled back concurrently; commit lost the race and is NOT durable")
    }
  }

  /** Explicit rollback (deleteTx, MVCC.hs:301-312): resolves the id
    * without committing it, so the watermark can advance past it.
    * Idempotent. Aborting a committed transaction is a caller bug.
    * Converges against a racing [[commit]] by the same
    * write-then-re-check rule (see [[commit]]'s note): if the commit
    * marker landed between our pre-check and our marker write, the
    * abort yields — the committed transaction stays durable.
    */
  def abort(dir: String, tx: Long): Unit = {
    if (isCommitted(dir, tx))
      throw new IllegalStateException(s"tx $tx is committed; cannot abort")
    Sidecar.writeString(s"${txDir(dir)}/abort-$tx", "")
    if (Sidecar.exists(s"${txDir(dir)}/commit-$tx")) {
      Sidecar.delete(s"${txDir(dir)}/abort-$tx")
      throw new IllegalStateException(
        s"tx $tx committed concurrently; abort lost the race")
    }
  }

  /** Crash janitor: abort every allocated-but-unresolved tx whose
    * `alloc-` marker is older than `horizonMs` — a session that died
    * between [[begin]] and [[commit]] otherwise wedges the watermark
    * forever. The horizon is the operator's promise that no LIVE
    * transaction runs longer; a too-short horizon aborts a slow
    * writer (its later [[commit]] then fails loud on the abort
    * marker, never silently half-applies). Returns the aborted ids.
    */
  def abortStale(dir: String, horizonMs: Long): Seq[Long] = {
    val cutoff = System.currentTimeMillis() - horizonMs
    val resolved = (idsWithPrefix(dir, "commit-") ++ idsWithPrefix(dir, "abort-")).toSet
    val w = watermark(dir)
    idsWithPrefix(dir, "alloc-")
      .filter(id => id > w && !resolved(id))
      .filter(id => Sidecar.modificationTime(s"${txDir(dir)}/alloc-$id").exists(_ < cutoff))
      .sorted
      // a slow writer's commit can land between the unresolved listing
      // above and the abort — [[abort]]'s write-then-re-check yields to
      // it (deleting the janitor's marker); the janitor then simply
      // does not report that id as aborted
      .flatMap { id =>
        try { abort(dir, id); Some(id) }
        catch { case _: IllegalStateException => None }
      }
  }

  /** The committed set above the watermark plus the watermark itself
    * (`(w, recentIds)`): the compact representation every reader
    * needs. Aborted ids are never in `recentIds`, but ids `<= w` are
    * only committed net of [[abortedSet]].
    */
  def committedState(dir: String): (Long, Set[Long]) = {
    val w = watermark(dir)
    (w, idsWithPrefix(dir, "commit-").filter(_ > w).toSet)
  }

  /** The retained abort list (exception list under and above the
    * watermark).
    */
  def abortedSet(dir: String): Set[Long] =
    idsWithPrefix(dir, "abort-").toSet

  def isCommitted(dir: String, tx: Long): Boolean = {
    val (w, recent) = committedState(dir)
    (tx <= w || recent(tx)) && !abortedSet(dir).contains(tx)
  }

  /** The committed-set membership predicate for [[Mvcc.visible]]:
    * one comparison against the watermark plus `isin`s over the
    * in-flight window and the abort list — codegen-friendly,
    * size-bounded.
    */
  def committedColumn(dir: String): Column => Column = {
    val (w, recent) = committedState(dir)
    val aborted = abortedSet(dir)
    c => {
      val committed = if (recent.isEmpty) c <= w else c <= w || c.isin(recent.toSeq: _*)
      if (aborted.isEmpty) committed
      else committed && !c.isin(aborted.toSeq: _*)
    }
  }

  /** Cross-session snapshot read: [[Mvcc.visible]] with the
    * PERSISTED committed set, bounded to transactions ordered BEFORE
    * the reader — a tx that began and committed after `tx` began is
    * invisible (the reference's `isCommittedBefore` rule,
    * MVCC.hs:286-298: `txCommittedID < reader txId`; ids are
    * allocation-ordered here, the serial-history approximation of
    * commit order that [[Mvcc.visibleAt]] also uses).
    */
  def visibleStore(dir: String, tx: Long): Column = {
    val committed = committedColumn(dir)
    Mvcc.visible(tx, c => committed(c) && c < lit(tx))
  }

  /** Advance the watermark over the contiguous RESOLVED prefix
    * (committed or aborted) and drop its commit/alloc markers; abort
    * markers are retained (see the class note — they may guard
    * not-yet-purged staged versions). A crash mid-delete leaves
    * markers `<= w`, which [[committedState]] already ignores —
    * re-running finishes the cleanup. Never advances past a gap: an
    * in-flight (allocated, unresolved) tx keeps everything above it
    * in the marker set.
    *
    * Concurrent compactors are serialized by an exclusive lock file
    * (a dead compactor's stale lock is broken after `lockHorizonMs`),
    * and the watermark write re-reads and never regresses — so a
    * racing pair can never publish a watermark smaller than one whose
    * markers were already deleted.
    */
  def compact(dir: String, lockHorizonMs: Long = 60 * 60 * 1000L): Unit = {
    val lock = s"${txDir(dir)}/compact-lock"
    if (!Sidecar.createExclusive(lock)) {
      // break a dead compactor's lock by RENAMING it to a unique
      // tombstone: a rename's source must exist at the instant of the
      // move, so (a) two breakers can never both succeed (the r11
      // check-mtime-then-delete let a pair delete a stale lock AND a
      // fresh replacement — two live compactors), and (b) the mtime
      // re-read immediately before the steal keeps the
      // fresh-lock-replaced-stale window to microseconds instead of
      // the whole staleness check
      def staleNow = Sidecar.modificationTime(lock)
        .exists(_ < System.currentTimeMillis() - lockHorizonMs)
      if (!staleNow) return // another compactor is active; this run is a no-op
      val tomb = s"$lock-broken-${java.util.UUID.randomUUID().toString.take(8)}"
      if (!staleNow || !Sidecar.rename(lock, tomb)) return // lost the break race
      Sidecar.delete(tomb)
      if (!Sidecar.createExclusive(lock)) return // a third compactor slipped in
    }
    try {
      val w0 = watermark(dir)
      val resolved = (idsWithPrefix(dir, "commit-") ++ idsWithPrefix(dir, "abort-"))
        .filter(_ > w0).distinct.sorted
      var w = w0
      for (id <- resolved if id == w + 1) w = id
      // never regress: a concurrent writer cannot have LOWERED the
      // stored watermark (writes are max-guarded), so max() is safe
      val wFinal = math.max(w, watermark(dir))
      if (wFinal > w0) Sidecar.writeString(s"${txDir(dir)}/watermark", wFinal.toString)
      idsWithPrefix(dir, "commit-").filter(_ <= wFinal)
        .foreach(id => Sidecar.delete(s"${txDir(dir)}/commit-$id"))
      idsWithPrefix(dir, "alloc-").filter(_ <= wFinal)
        .foreach(id => Sidecar.delete(s"${txDir(dir)}/alloc-$id"))
    } finally Sidecar.delete(lock)
  }

  /** Drop abort markers for transactions whose staged versions have
    * been physically purged from the data (the caller ran
    * [[Mvcc.compact]]-style maintenance and rewrote every file that
    * held `tx_min`/`tx_max` = these ids). Only markers at or below
    * the watermark may be forgotten — above it the id is unresolved
    * without its marker.
    */
  def forgetAborted(dir: String, ids: Set[Long]): Unit = {
    val w = watermark(dir)
    val bad = ids.filter(_ > w)
    require(bad.isEmpty,
      s"cannot forget aborts above the watermark $w: ${bad.toSeq.sorted.mkString(", ")}")
    ids.foreach(id => Sidecar.delete(s"${txDir(dir)}/abort-$id"))
  }

  /** THE end-to-end rollback purge (the maintenance recipe `forgetAborted`
    * assumes): take every abort marker at or below the watermark,
    * rewrite the versioned data with those transactions physically
    * removed ([[Mvcc.purgeAborted]] — staged creates dropped, staged
    * deletes re-opened), hand the purged frame to `persist` (the
    * caller's durable snapshot rewrite — forgetting markers before the
    * rewrite is durable would make the staged versions visible on a
    * crash, which is why the two steps compose HERE and not ad hoc),
    * and only then drop the markers. Returns the purged ids. Aborts
    * above the watermark stay: they may still be racing a commit.
    * Invariant (gated by TxLogSpec): after a purge cycle no surviving
    * row has `tx_min`/`tx_max` in the purged set and no purged marker
    * survives, while reads through [[committedColumn]] are unchanged.
    */
  def purgeAborted(dir: String, versioned: org.apache.spark.sql.DataFrame)(
      persist: org.apache.spark.sql.DataFrame => Unit): Set[Long] = {
    val w = watermark(dir)
    val purgeable = abortedSet(dir).filter(_ <= w)
    if (purgeable.isEmpty) return Set.empty
    persist(Mvcc.purgeAborted(versioned, purgeable))
    forgetAborted(dir, purgeable)
    purgeable
  }
}

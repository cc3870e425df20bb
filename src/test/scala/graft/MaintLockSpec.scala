package graft

import org.apache.spark.sql.functions._

import graft.core.{MaintLock, Sidecar}
import graft.pipeline.{Cdc, LmIndex, Retrieval}

/** The coupled-store maintenance window is enforced by MECHANISM:
  * takedowns and versioned compacts of the lexical / LM / CDC stores
  * mutually exclude through the store's maintenance lock — a
  * takedown arriving while a compact window is open raises
  * MaintLock.StoreBusy instead of landing a half-applied (marker,
  * counter) pair, and the lock releases cleanly on both the success
  * and failure paths.
  */
class MaintLockSpec extends GraftSuite {
  import spark.implicits._

  private def docs = graft.sources.Tables(spark, sf001).documents
    .select(col("doc_id"), col("text"))

  private def holdingLock[A](store: String)(f: => A): A = {
    val nonce = Sidecar.acquireLock(MaintLock.lockPath(store),
      MaintLock.DefaultHorizonMs).getOrElse(fail("could not take the test lock"))
    try f finally Sidecar.releaseLock(MaintLock.lockPath(store), nonce)
  }

  test("a lexical takedown during a simulated compact window raises, then succeeds") {
    val root = graft.queries.SessionPublish.tempDir("maint-lex") + "/idx"
    Retrieval.publishIndex(docs, "doc_id", col("text"), root, buckets = 8)
    val before = Retrieval.readLexMeta(root)
    holdingLock(root) {
      intercept[MaintLock.StoreBusy] {
        Retrieval.deleteDocs(spark, root, Seq(1L))
      }
    }
    assert(Retrieval.readLexMeta(root) === before,
      "a refused takedown must leave the store untouched")
    // window closed: the same takedown goes through and releases its lock
    Retrieval.deleteDocs(spark, root, Seq(1L))
    assert(Retrieval.readLexMeta(root)("n").toLong === before("n").toLong - 1)
    assert(!Sidecar.exists(MaintLock.lockPath(root)),
      "the takedown must release the lock")
  }

  test("a versioned lexical compact is refused while a takedown holds the lock") {
    val r = graft.queries.SessionPublish.tempDir("maint-lex-compact")
    graft.core.Versions.publish(r) { v1 =>
      Retrieval.publishIndex(docs, "doc_id", col("text"), v1, buckets = 8)
    }
    val live = graft.core.Versions.currentPath(r).get
    holdingLock(live) {
      intercept[MaintLock.StoreBusy] {
        Retrieval.compactIndexVersioned(spark, r)
      }
    }
    // and a normal compact acquires + releases transparently
    Retrieval.compactIndexVersioned(spark, r)
    assert(!Sidecar.exists(MaintLock.lockPath(live)),
      "the compact must release the source version's lock")
  }

  test("LM takedown and versioned compact exclude each other") {
    val root = graft.queries.SessionPublish.tempDir("maint-lm")
    graft.core.Versions.publish(root) { v1 =>
      LmIndex.publish(docs, "doc_id", col("text"), v1)
    }
    val live = graft.core.Versions.currentPath(root).get
    val victim = docs.filter(col("doc_id") === 1L)
    holdingLock(live) {
      intercept[MaintLock.StoreBusy] {
        LmIndex.delete(victim, "doc_id", col("text"), live)
      }
      intercept[MaintLock.StoreBusy] {
        LmIndex.compactVersioned(spark, root)
      }
    }
    LmIndex.delete(victim, "doc_id", col("text"), live)
    LmIndex.compactVersioned(spark, root): Unit
    assert(!Sidecar.exists(MaintLock.lockPath(live)))
  }

  test("appends are writers too: batch and streamed lexical appends refuse an open window") {
    val root = graft.queries.SessionPublish.tempDir("maint-lex-append") + "/idx"
    val base = docs.filter(col("doc_id") % 2 === 0)
    val streamed = docs.filter(col("doc_id") % 2 === 1)
    Retrieval.publishIndex(base, "doc_id", col("text"), root, buckets = 8)
    val nBefore = Retrieval.readLexMeta(root)("n").toLong
    val ckpt = graft.queries.SessionPublish.tempDir("maint-lex-append-ckpt")
    holdingLock(root) {
      intercept[MaintLock.StoreBusy] {
        Retrieval.appendIndex(streamed, "doc_id", col("text"), root)
      }
      intercept[MaintLock.StoreBusy] {
        graft.streaming.LexStream.appendBatch(spark, streamed, ckpt, 0L,
          "doc_id", col("text"), root)
      }
    }
    assert(Retrieval.readLexMeta(root)("n").toLong === nBefore,
      "refused appends must leave the counters untouched")
    // window closed: the SAME streamed batch retries and lands exactly once
    assert(graft.streaming.LexStream.appendBatch(spark, streamed, ckpt, 0L,
      "doc_id", col("text"), root).nonEmpty, "retry after the window must commit")
    assert(graft.streaming.LexStream.appendBatch(spark, streamed, ckpt, 0L,
      "doc_id", col("text"), root).isEmpty, "second retry is a replay no-op")
    assert(Retrieval.readLexMeta(root)("n").toLong === docs.count(),
      "the retried batch must be counted exactly once")
    assert(!Sidecar.exists(MaintLock.lockPath(root)))
  }

  test("LM and CDC appends refuse an open window") {
    val lmRoot = graft.queries.SessionPublish.tempDir("maint-lm-append")
    LmIndex.publish(docs, "doc_id", col("text"), lmRoot)
    val batch = docs.filter(col("doc_id") === 2L)
    holdingLock(lmRoot) {
      intercept[MaintLock.StoreBusy] {
        LmIndex.append(batch, "doc_id", col("text"), lmRoot)
      }
      intercept[MaintLock.StoreBusy] {
        graft.streaming.LmStream.appendBatch(spark, batch,
          graft.queries.SessionPublish.tempDir("maint-lm-append-ckpt"), 0L,
          "doc_id", col("text"), lmRoot)
      }
    }
    val cdcRoot = graft.queries.SessionPublish.tempDir("maint-cdc-append")
    Cdc.publishChunkStore(docs, "doc_id", col("text"), avgChunk = 32, cdcRoot)
    holdingLock(cdcRoot) {
      intercept[MaintLock.StoreBusy] {
        Cdc.appendChunkStore(batch, "doc_id", col("text"), cdcRoot)
      }
    }
    // windows closed: all three go through and release their locks
    LmIndex.append(batch, "doc_id", col("text"), lmRoot)
    Cdc.appendChunkStore(batch, "doc_id", col("text"), cdcRoot)
    assert(!Sidecar.exists(MaintLock.lockPath(lmRoot)))
    assert(!Sidecar.exists(MaintLock.lockPath(cdcRoot)))
  }

  test("CDC takedown during a simulated compact window raises, then succeeds") {
    val root = graft.queries.SessionPublish.tempDir("maint-cdc")
    graft.core.Versions.publish(root) { v1 =>
      Cdc.publishChunkStore(docs, "doc_id", col("text"), avgChunk = 32, v1)
    }
    val live = graft.core.Versions.currentPath(root).get
    val victim = docs.filter(col("doc_id") === 1L)
    holdingLock(live) {
      intercept[MaintLock.StoreBusy] {
        Cdc.deleteFromChunkStore(victim, "doc_id", col("text"), live)
      }
    }
    Cdc.deleteFromChunkStore(victim, "doc_id", col("text"), live)
    Cdc.compactChunkStoreVersioned(spark, root): Unit
    assert(!Sidecar.exists(MaintLock.lockPath(live)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Cdc

/** Content-defined chunking: exact tiling, shift resistance (THE
  * property that distinguishes CDC from fixed chunking), cross-doc
  * sharing, and sub-window degenerate docs.
  */
class CdcSpec extends GraftSuite {
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)], avg: Int = 32) =
    Cdc.chunks(rows.toDF("doc_id", "text"), "doc_id", col("text"), avg)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("chunks tile the text exactly: contiguous, complete, hash-consistent") {
    val text = Tables.docs(spark, sf001).limit(20)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val got = chunksOf(text)
    val byDoc = got.groupBy(_._1)
    text.foreach { case (id, t) =>
      val cs = byDoc(id)
      assert(cs.head._3 === 1L, "first chunk starts at 1")
      assert(cs.map(c => c._3 + c._4 - 1).max === t.length, "last chunk ends at length")
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 === a._3 + a._4, "chunks are contiguous")
        case _ =>
      }
      cs.foreach { c =>
        val content = t.substring(c._3.toInt - 1, (c._3 + c._4 - 1).toInt)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(c._5 === md5, "chunk hash is the hash of the tiled content")
      }
    }
  }

  test("shift resistance: a prefix edit re-chunks only the head") {
    val t = Tables.docs(spark, sf001).filter(col("doc_id") === 1L)
      .select(col("text")).head().getString(0)
    val orig = chunksOf(Seq((1L, t))).map(_._5)
    val shifted = chunksOf(Seq((1L, "zzzz " + t))).map(_._5)
    // every original chunk except (at most) the first must survive the
    // insertion verbatim — fixed-size chunking would lose all of them
    val surviving = orig.toSet.intersect(shifted.toSet).size
    assert(surviving >= orig.size - 1,
      s"CDC must keep tail chunks stable: ${surviving} of ${orig.size} survived")
    assert(orig.size > 2, "test doc must actually chunk")
  }

  test("identical phrases across docs produce identical chunk hashes") {
    val shared = "batch batch batch window merge sort key table scan " * 3
    val rows = Seq((1L, "aaa " + shared + " xxx"), (2L, "bbbbbbb " + shared + " yyy"))
    val sharedCount = Cdc.sharedChunks(rows.toDF("doc_id", "text"), "doc_id",
      col("text"), 32).count()
    assert(sharedCount >= 2, s"interior chunks of the shared run must collide: $sharedCount")
  }

  test("docs shorter than the window are one whole-text chunk") {
    val got = chunksOf(Seq((5L, "abc")))
    assert(got.map(c => (c._2, c._3, c._4)) === Seq((1L, 1L, 3L)))
  }

  test("codegen boundary expression == HOF form, bit for bit") {
    // the corpus plus crafted edges: sub-window, exactly-window,
    // non-ASCII code points (ascii() returns code points, and the
    // expression must count positions in characters, not bytes)
    val corpus = Tables.docs(spark, sf001).limit(100)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val crafted = Seq(
      (100001L, "abc"), (100002L, "exactly8"), (100003L, ""),
      (100004L, "héllo wörld café € straße " * 20),
      (100005L, ("batch batch window merge " * 40)))
    val df = (corpus ++ crafted).toDF("doc_id", "text")
    for (avg <- Seq(1, 32, 200)) {
      val fast = Cdc.chunks(df, "doc_id", col("text"), avg)
        .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      val ref = Cdc.chunksHof(df, "doc_id", col("text"), avg)
        .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(fast === ref, s"avg=$avg diverged")
    }
  }

  test("chunk-index takedown == reindex of the survivors, bit for bit") {
    val docs = Tables.docs(spark, sf001).select(col("doc_id"), col("text"))
    val full = Cdc.chunkIndex(docs, "doc_id", col("text"), 32)
    val tomb = docs.filter(col("doc_id") % 5 === 0)
    val got = Cdc.deleteFromChunkIndex(full, tomb, "doc_id", col("text"), 32)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val want = Cdc.chunkIndex(docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", col("text"), 32)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want, "negated fold must equal the from-scratch reindex")
    // non-vacuous: the takedown actually removed rows AND decremented
    // survivors (a chunk shared with a tombstoned doc loses copies)
    val fullRows = full.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.size < fullRows.size, "tombstone-only chunks must drop")
    val fullByHash = fullRows.map(r => r._1 -> r._2).toMap
    assert(got.exists(r => fullByHash(r._1) > r._2),
      "shared chunks must lose the tombstoned copies, not vanish")
  }

  test("takedown-contract violation fails loud: a negative merged count raises") {
    // tombstoning documents the index does not (any longer) hold
    // drives their chunk counts NEGATIVE — impossible under the
    // contract, so the read must raise (CountGuard), never silently
    // drop the rows as if they were legitimately zeroed. Double-apply
    // the same tombstone batch: the second fold is exactly such a
    // violation.
    val docs = Tables.docs(spark, sf001).select(col("doc_id"), col("text"))
    val full = Cdc.chunkIndex(docs, "doc_id", col("text"), 32)
    val tomb = docs.filter(col("doc_id") % 5 === 0)
    val once = Cdc.deleteFromChunkIndex(full, tomb, "doc_id", col("text"), 32)
    val twice = Cdc.deleteFromChunkIndex(once, tomb, "doc_id", col("text"), 32)
    val ex = intercept[Exception](twice.collect())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(ex).exists(_.contains("takedown contract violated")),
      s"expected the CountGuard contract error, got: ${chain(ex).take(3)}")
  }

  test("chunk store: publish+append+negated delete == survivor reindex; compact folds segments") {
    val docs = Tables.docs(spark, sf001).select(col("doc_id"), col("text"))
    val root = graft.queries.SessionPublish.tempDir("cdc-store") + "/store"
    graft.core.Versions.publish(root) { v1 =>
      Cdc.publishChunkStore(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", col("text"), avgChunk = 32, v1)
      Cdc.appendChunkStore(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", col("text"), v1)
      Cdc.deleteFromChunkStore(docs.filter(col("doc_id") % 5 === 0),
        "doc_id", col("text"), v1)
    }
    val live = graft.core.Versions.currentPath(root).get
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = rows(Cdc.chunkIndex(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", col("text"), 32))
    assert(rows(Cdc.readChunkStore(spark, live)) === want,
      "store read must equal a from-scratch reindex of the survivors")

    // segment files accumulated by the three writes fold into one set
    def dataFiles(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }
    val before = dataFiles(s"$live/chunks")
    Cdc.compactChunkStoreVersioned(spark, root)
    val compacted = graft.core.Versions.currentPath(root).get
    assert(compacted != live)
    assert(rows(Cdc.readChunkStore(spark, compacted)) === want,
      "compaction must be invisible to readers")
    assert(dataFiles(s"$compacted/chunks") < before,
      "compaction must coalesce the delete-era segments")
  }

  test("chunk store: a double-applied takedown fails loud at read") {
    val docs = Tables.docs(spark, sf001).select(col("doc_id"), col("text"))
    val path = graft.queries.SessionPublish.tempDir("cdc-store-guard") + "/store"
    Cdc.publishChunkStore(docs, "doc_id", col("text"), avgChunk = 32, path)
    val tomb = docs.filter(col("doc_id") % 5 === 0)
    Cdc.deleteFromChunkStore(tomb, "doc_id", col("text"), path)
    Cdc.deleteFromChunkStore(tomb, "doc_id", col("text"), path)
    val ex = intercept[Exception](Cdc.readChunkStore(spark, path).collect())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(ex).exists(_.contains("takedown contract violated")),
      s"expected the CountGuard contract error, got: ${chain(ex).take(3)}")
  }

  test("chunk store: append/delete refuse a layout with a drifted or missing sidecar") {
    val docs = Tables.docs(spark, sf001).select(col("doc_id"), col("text")).limit(5)
    val path = graft.queries.SessionPublish.tempDir("cdc-store-kind") + "/store"
    intercept[IllegalArgumentException](
      Cdc.appendChunkStore(docs, "doc_id", col("text"), path))
    // a sidecar of another kind must fail the kind guard
    graft.core.Sidecar.writeProps(s"$path/_cdcmeta", Seq("kind" -> "lm", "avg_chunk" -> "32"))
    intercept[IllegalArgumentException](
      Cdc.deleteFromChunkStore(docs, "doc_id", col("text"), path))
  }

  private object Tables {
    def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.sources.Tables(s, dir).documents
  }
}

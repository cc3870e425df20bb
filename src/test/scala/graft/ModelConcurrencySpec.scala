package graft

import graft.core.Model

/** Concurrent model mutation conformance — the reference proves 10
  * async writers x 25 get-or-create ops converge to one bijective
  * dictionary (STMGraph RawSpec.hs:60-76). The engine's additive
  * segment protocol must give two racing sessions the same guarantee:
  * no lost types, no duplicate names, dense bijective ids.
  */
class ModelConcurrencySpec extends GraftSuite {

  private def entriesFor(w: Int, i: Int): Seq[(String, String, Option[Byte])] = Seq(
    ("node", s"Type${(w + 2 * i) % 30}", None),
    ("edge", s"rel${i % 7}", None),
    ("prop", s"p${(w * 3 + i) % 11}", Some(0: Byte)))

  test("two racing writers x 25 get-or-create ops converge, bijective, no lost types") {
    val dir = graft.queries.SessionPublish.tempDir("model-conc")
    @volatile var failure: Option[Throwable] = None
    val threads = (0 until 2).map { w =>
      new Thread(() => try {
        (0 until 25).foreach(i => Model.getOrCreate(spark, dir, entriesFor(w, i)))
      } catch { case t: Throwable => failure = Some(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    failure.foreach(throw _)

    val rows = Model.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getByte(3))))
    val expected = (for (w <- 0 until 2; i <- 0 until 25; e <- entriesFor(w, i))
      yield e).toSet
    assert(rows.map(r => (r._1, r._3, r._4)).toSet === expected, "no lost or extra types")
    assert(rows.length === expected.size, "each type appears exactly once")
    // bijective dense ids per kind
    rows.groupBy(_._1).foreach { case (kind, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length).toSeq,
        s"$kind ids must be dense 1..${rs.length}")
      assert(rs.map(r => (r._3, r._4)).distinct.length === rs.length,
        s"$kind names must be unique")
    }
  }

  test("get-or-create is idempotent and compaction preserves the dictionary") {
    val dir = graft.queries.SessionPublish.tempDir("model-compact")
    Model.getOrCreate(spark, dir, Seq(("node", "A", None), ("node", "B", None)))
    Model.getOrCreate(spark, dir, Seq(("node", "B", None), ("node", "C", None)))
    Model.getOrCreate(spark, dir, Seq(("node", "A", None))) // fully present: no-op
    val before = Model.read(spark, dir).collect().map(_.toSeq).toSet
    Model.compact(spark, dir)
    val after = Model.read(spark, dir).collect().map(_.toSeq).toSet
    assert(after === before, "compaction must not change the visible dictionary")
    assert(before.map(_(2)) === Set("A", "B", "C"))
    // post-compaction appends still converge
    Model.getOrCreate(spark, dir, Seq(("node", "D", None)))
    assert(Model.read(spark, dir).collect().map(r => r.getString(2)).toSet
      === Set("A", "B", "C", "D"))
  }

  test("an id, once returned, never changes as later names land (fetchType stability)") {
    val dir = graft.queries.SessionPublish.tempDir("model-stable")
    def ids(): Map[String, Int] = Model.lookup(Model.read(spark, dir), "node")

    // "M" lands first and takes id 1
    Model.getOrCreate(spark, dir, Seq(("node", "M", None)))
    assert(ids() === Map("M" -> 1))
    // "A" sorts BEFORE "M" but arrives later: it must take a NEW id
    // above the max, never displace M (the old dense re-rank gave A=1)
    Model.getOrCreate(spark, dir, Seq(("node", "A", None)))
    assert(ids() === Map("M" -> 1, "A" -> 2))
    // one segment with several new names: ordered among themselves,
    // still all above the existing max
    Model.getOrCreate(spark, dir, Seq(("node", "Z", None), ("node", "B", None)))
    assert(ids() === Map("M" -> 1, "A" -> 2, "B" -> 3, "Z" -> 4))
    // compaction freezes ids into the base; later arrivals continue above
    Model.compact(spark, dir)
    assert(ids() === Map("M" -> 1, "A" -> 2, "B" -> 3, "Z" -> 4),
      "compaction must never renumber")
    Model.getOrCreate(spark, dir, Seq(("node", "0first", None)))
    assert(ids() === Map("M" -> 1, "A" -> 2, "B" -> 3, "Z" -> 4, "0first" -> 5))
    // ids stay dense and bijective throughout
    assert(ids().values.toSeq.sorted === (1 to 5))
  }

  test("two racing writers: converged ids are stable under a later writer") {
    val dir = graft.queries.SessionPublish.tempDir("model-stable-conc")
    @volatile var failure: Option[Throwable] = None
    val threads = (0 until 2).map { w =>
      new Thread(() => try {
        Model.getOrCreate(spark, dir,
          Seq(("node", s"W$w-a", None), ("node", s"W$w-b", None), ("node", "shared", None)))
      } catch { case t: Throwable => failure = Some(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    failure.foreach(throw _)
    val settled = Model.lookup(Model.read(spark, dir), "node")
    assert(settled.keySet === Set("W0-a", "W0-b", "W1-a", "W1-b", "shared"))
    assert(settled.values.toSeq.sorted === (1 to 5), "dense bijective after the race")
    // a THIRD writer appends: every settled id is untouched
    Model.getOrCreate(spark, dir, Seq(("node", "later", None)))
    val after = Model.lookup(Model.read(spark, dir), "node")
    settled.foreach { case (n, id) =>
      assert(after(n) === id, s"id of $n changed ($id -> ${after(n)}) after a later writer")
    }
    assert(after("later") === 6)
  }

  test("concurrent base publishes: exclusive version claims, monotonic pointer, deferred prune") {
    val dir = graft.queries.SessionPublish.tempDir("model-base-race")
    Model.getOrCreate(spark, dir, Seq(("node", "A", None), ("node", "B", None)))
    val want = Model.read(spark, dir).collect().map(_.toSeq).toSet
    // two concurrent compactions: the r11 defect had both resolve
    // prev=N and overwrite the SAME v(N+1) directory (torn base); the
    // claim protocol must route them to distinct versions
    @volatile var failure: Option[Throwable] = None
    val threads = (0 until 2).map(_ => new Thread(() =>
      try Model.compact(spark, dir)
      catch { case t: Throwable => failure = Some(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    failure.foreach(throw _)
    assert(Model.read(spark, dir).collect().map(_.toSeq).toSet === want,
      "the dictionary must survive racing compactors intact")
    // superseded versions are pruned DEFERRED (age-gated), never at
    // the flip — a lazy reader resolving the old path mid-flip keeps
    // scanning it; the janitor with grace 0 then clears them
    val versions = graft.core.Sidecar.listNames(s"$dir/model_base")
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit)).map(_.drop(1).toLong)
    Model.pruneBaseVersions(dir, graceMs = 0L)
    val left = graft.core.Sidecar.listNames(s"$dir/model_base")
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit)).map(_.drop(1).toLong)
    assert(left.length === 1 && left.head === versions.max,
      s"janitor must leave exactly the current version: had $versions, left $left")
    assert(Model.read(spark, dir).collect().map(_.toSeq).toSet === want)
  }

  test("crashed claim gap: readers stall at the gap, the janitor tombstones it, ids never shift") {
    val dir = graft.queries.SessionPublish.tempDir("model-gap")
    // store-level grace: the janitor horizon every session honors —
    // short here so the crashed claim resolves inside the test
    Model.setPublishGraceMs(dir, 300L)
    assert(Model.publishGraceMs(dir) === 300L)
    Model.getOrCreate(spark, dir, Seq(("node", "A", None)))
    val idA = Model.lookup(Model.read(spark, dir), "node")("A")
    // a writer claims the next sequence and dies before publishing
    assert(graft.core.Sidecar.createExclusive(s"$dir/model_segments/claim-2"))
    // readers poll THROUGH the gap's whole lifecycle while a live
    // writer publishes past it; every id snapshot must agree with the
    // final dictionary (a zombie-late shift would break this)
    val snaps = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Int]]()
    @volatile var stop = false
    @volatile var failure: Option[Throwable] = None
    val readers = (0 until 2).map(_ => new Thread(() =>
      try while (!stop) snaps.add(Model.lookup(Model.read(spark, dir), "node"))
      catch { case t: Throwable => failure = Some(t) }))
    readers.foreach(_.start())
    // publishes claim 3; invisible until the gap at 2 is janitored,
    // then visible — getOrCreate's wait loop rides the store grace
    Model.getOrCreate(spark, dir, Seq(("node", "B", None)))
    stop = true; readers.foreach(_.join())
    failure.foreach(throw _)
    assert(graft.core.Sidecar.exists(s"$dir/model_segments/dead-2"),
      "the crashed claim must be tombstoned, not block forever")
    val fin = Model.lookup(Model.read(spark, dir), "node")
    assert(fin("A") === idA && fin.keySet === Set("A", "B"))
    scala.jdk.CollectionConverters.CollectionHasAsScala(snaps).asScala.foreach { m =>
      m.foreach { case (n, id) =>
        assert(fin(n) === id, s"reader saw $n=$id but the settled id is ${fin(n)}")
      }
    }
  }
}

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
}

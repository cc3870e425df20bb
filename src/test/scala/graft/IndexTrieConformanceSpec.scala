package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.UniqueIndex

/** Conformance with the reference's trie-level index tests
  * (HGraphStorage IndexTest.hs) — insert/overwrite/delete around
  * prefix-sharing keys, insertNew collision behavior over real
  * package names, and ordered prefix enumeration.
  */
class IndexTrieConformanceSpec extends GraftSuite {

  private def idx(entries: (String, Long)*): DataFrame = {
    import spark.implicits._
    entries.toSeq.toDF("key", "id").select(lit(0).as("vType"), col("key"), col("id"))
  }

  private def lookup(i: DataFrame, k: String): Option[Long] =
    UniqueIndex.lookup(i, k).collect().map(_.getAs[Long]("id")).headOption

  test("Trie test: insert, overwrite returns old value, delete keeps i/inn (IndexTest.hs:18-62)") {
    val i0 = idx("i" -> 11L, "in" -> 5L, "inn" -> 9L, "A" -> 15L)
    // overwrite A: 15 -> 16; the displaced frame carries the old value
    val (i1, displaced) = UniqueIndex.upsert(i0, idx("A" -> 16L))
    assert(displaced.collect().map(r => (r.getString(1), r.getLong(2))).toSeq == Seq("A" -> 15L))
    assert(lookup(i1, "A").contains(16L))
    // delete "in": "inn" and "i" survive (prefix-sharing neighbors)
    val i2 = UniqueIndex.deleteKey(i1, 0, "in")
    assert(lookup(i2, "in").isEmpty)
    assert(lookup(i2, "inn").contains(9L))
    assert(lookup(i2, "i").contains(11L))
  }

  test("Collision test: insertNew over hackage-style names (IndexTest.hs:63-77)") {
    val (i1, rej1) = UniqueIndex.insertNew(idx("3d-graphics-examples" -> 1L),
      idx("ac-machine" -> 945L, "ac-machine-conduit" -> 946L))
    assert(rej1.isEmpty, "fresh keys insert cleanly")
    assert(lookup(i1, "ac-machine").contains(945L))
    assert(lookup(i1, "ace").isEmpty)
    val (i2, rej2) = UniqueIndex.insertNew(i1,
      idx("accelerate-fourier-benchmark" -> 956L, "ace" -> 961L))
    assert(rej2.isEmpty)
    assert(lookup(i2, "ace").contains(961L))
    assert(lookup(i2, "ac-machine").contains(945L), "shared prefixes never collide")
  }

  test("Prefix test: nested prefixes enumerate correctly (IndexTest.hs:78-90)") {
    val i = idx("A" -> 15L, "tea" -> 3L, "ted" -> 4L, "to" -> 7L)
    def pf(p: String) = UniqueIndex.prefix(i, p).orderBy(col("key"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(pf("AB") == Nil)
    assert(pf("tea") == Seq("tea" -> 3L))
    assert(pf("te") == Seq("tea" -> 3L, "ted" -> 4L))
    assert(pf("t") == Seq("tea" -> 3L, "ted" -> 4L, "to" -> 7L))
    assert(pf("") == Seq("A" -> 15L, "tea" -> 3L, "ted" -> 4L, "to" -> 7L),
      "empty prefix enumerates everything")
  }
}

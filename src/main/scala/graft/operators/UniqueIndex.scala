package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's index surface (SURVEY §2.8) without the trie: on
  * columnar storage an "index" is a derived, optionally bucketed
  * key→id table plus predicates that push into the scan. Point
  * lookups become pruned scans (min-max/dictionary/bloom in parquet),
  * prefix queries become `startsWith` (pushable as >= / < bounds),
  * and unique enforcement is a groupBy-count check.
  */
object UniqueIndex {

  /** Raised on unique-key violation — the `DuplicateIndexKey` analog
    * (HGraphStorage Types.hs:423, API.hs:217-229).
    */
  final class DuplicateIndexKeyException(msg: String) extends RuntimeException(msg)

  /** Index metadata (IndexInfo, HGraphStorage API.hs:49-53).
    * `unique` enables the reference's duplicate check on maintenance
    * (checkDuplicates, API.hs:217-229) — the reference's trie indexes
    * hold one owner per key, so this defaults on; pass false for
    * plain secondary indexes over non-unique properties.
    */
  final case class IndexInfo(name: String, labels: Seq[String], property: String,
      unique: Boolean = true)

  /** Keys occurring more than once (checkDuplicates,
    * API.hs:217-229) — empty means the unique constraint holds.
    */
  def duplicates(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Enforce uniqueness; throws DuplicateIndexKeyException listing a
    * sample of offending keys. This is an action (drives a job) —
    * call at commit/publish time, not per-row.
    */
  def requireUnique(df: DataFrame, keyCols: Seq[String]): Unit = {
    val dups = duplicates(df, keyCols).limit(5).collect()
    if (dups.nonEmpty)
      throw new DuplicateIndexKeyException(
        s"duplicate keys on (${keyCols.mkString(",")}): ${dups.mkString("; ")}")
  }

  /** Build the index table for a node snapshot: (key, id) for nodes
    * whose label is applicable (`isIndexApplicable`, API.hs:543-546)
    * — the backfill path (addIndex, API.hs:494-516) is the same
    * expression run over pre-existing rows.
    */
  def build(nodes: DataFrame, info: IndexInfo): DataFrame = {
    val applicable =
      if (info.labels.isEmpty) nodes else nodes.filter(col("label").isin(info.labels: _*))
    // multi-valued properties index EVERY value (getObjectValues,
    // API.hs:184-238) across all datatypes (valueToIndex,
    // Types.hs:391-394 keys text, integer AND binary); a value
    // repeated on one owner is one entry (trie stores one per key)
    val v = col("v")
    val key = when(v.getField("vType") === 0, v.getField("vText"))
      .when(v.getField("vType") === 1, v.getField("vInt").cast("string"))
      .when(v.getField("vType") === 2, lower(hex(v.getField("vBin"))))
      .otherwise(v.getField("vJson"))
    applicable
      .select(col("id"), explode(col("props").getItem(info.property)).as("v"))
      .select(v.getField("vType").as("vType"), key.as("key"), col("id"))
      .filter(col("key").isNotNull)
      .distinct()
  }

  /** Incremental maintenance on mutation — the reference's
    * diff-old/new-values path (`removeOldValuesFromIndex` +
    * `insertNewValuesInIndex`, HGraphStorage API.hs:184-238), run on
    * every `updateObject`/`deleteObject` so indexes never go stale.
    *
    * `before`/`after` are the TOUCHED node rows only (pre- and
    * post-mutation images restricted to the mutated ids), so cost is
    * O(touched), not O(corpus): the per-owner entry diff prunes
    * unchanged values exactly like the reference's `removeIdx` cases
    * (same values → no-op, gone → remove, new → insert). A delete
    * passes an empty `after` and every old entry is removed
    * (APITest.hs:128-157 conformance).
    *
    * When `info.unique`, additions clashing with a surviving entry of
    * a DIFFERENT owner — or with each other — raise
    * [[DuplicateIndexKeyException]] before any change is applied
    * (`checkDuplicates` excludes the object itself, API.hs:221).
    * The check is an action (drives a small job on the touched diff).
    */
  def maintain(index: DataFrame, before: DataFrame, after: DataFrame,
      info: IndexInfo): DataFrame = {
    val entryCols = Seq("vType", "key", "id")
    val old = build(before, info)
    val neu = build(after, info)
    val toRemove  = old.join(neu, entryCols, "left_anti")
    val toAdd     = neu.join(old, entryCols, "left_anti")
    val survivors = index.select(entryCols.map(col): _*)
      .join(toRemove, entryCols, "left_anti")
    if (info.unique) {
      val clash = toAdd
        .select(col("vType"), col("key"), col("id").as("attempted_id"))
        .join(survivors.withColumnRenamed("id", "existing_id"), Seq("vType", "key"))
        .filter(col("attempted_id") =!= col("existing_id"))
      val batchClash = toAdd.groupBy("vType", "key")
        .agg(countDistinct(col("id")).as("n")).filter(col("n") > 1)
      val sample = clash.limit(5).collect() ++ batchClash.limit(5).collect()
      if (sample.nonEmpty)
        throw new DuplicateIndexKeyException(
          s"index ${info.name}: duplicate keys on update: ${sample.mkString("; ")}")
    }
    survivors.unionAll(toAdd.select(entryCols.map(col): _*))
  }

  /** insert-if-absent (Trie.hs:165-205 `insertNew`): entries whose
    * key already exists — in the index or earlier in the batch — are
    * rejected and returned with the winning id. `keyCols` names the
    * index key; for [[build]]-produced indexes that is the typed
    * (vType, key) pair. Both frames must expose keyCols + `id`.
    * Returns (newIndex, rejected(keyCols..., existing_id,
    * attempted_id)).
    */
  def insertNew(index: DataFrame, entries: DataFrame,
      keyCols: Seq[String] = Seq("vType", "key")): (DataFrame, DataFrame) = {
    val cols = keyCols :+ "id"
    val existing = index.select(cols.map(col): _*).withColumnRenamed("id", "existing_id")
    val probed = entries.select(cols.map(col): _*).join(existing, keyCols, "left")
    val fresh = probed.filter(col("existing_id").isNull).drop("existing_id")
    // first-wins within the batch: min id per key
    val winners = fresh.groupBy(keyCols.map(col): _*).agg(min(col("id")).as("id"))
    val batchLosers = fresh.join(winners.withColumnRenamed("id", "existing_id"), keyCols)
      .filter(col("id") =!= col("existing_id"))
      .select(keyCols.map(col) :+ col("existing_id") :+ col("id").as("attempted_id"): _*)
    val indexLosers = probed.filter(col("existing_id").isNotNull)
      .select(keyCols.map(col) :+ col("existing_id") :+ col("id").as("attempted_id"): _*)
    (index.select(cols.map(col): _*).unionAll(winners.select(cols.map(col): _*)),
      indexLosers.unionAll(batchLosers))
  }

  /** Overwrite-upsert (Trie.hs:143-162 `insert`): the new value wins;
    * returns (newIndex, displaced) where `displaced` holds the
    * previous entries of overwritten keys — the reference's insert
    * returns the old value per key. `entries` must hold one entry per
    * key (sequential inserts collapse to last-wins before calling).
    */
  def upsert(index: DataFrame, entries: DataFrame,
      keyCols: Seq[String] = Seq("vType", "key")): (DataFrame, DataFrame) = {
    val cols = keyCols :+ "id"
    val e = entries.select(cols.map(col): _*)
    val displaced = index.select(cols.map(col): _*).join(e.select(keyCols.map(col): _*), keyCols, "left_semi")
    (index.select(cols.map(col): _*).join(e, keyCols, "left_anti").unionAll(e), displaced)
  }

  /** Key delete (Trie.hs:208-222 `delete`): remove exactly that typed
    * key's entries. On the reference's trie this must not disturb
    * prefix-sharing neighbors ("in" vs "i"/"inn"); on typed columns
    * that holds trivially, and the conformance spec pins it.
    */
  def deleteKey(index: DataFrame, vType: Int, key: String): DataFrame =
    index.filter(!(col("vType") === vType && col("key") === key))

  /** Exact-key point query (Trie.hs:225-239 lookup) — text keys.
    * The (vType, key) pair is the index key, so text "42" and
    * integer 42 are distinct entries, as in the reference's per-type
    * key encodings.
    */
  def lookup(index: DataFrame, key: String): DataFrame =
    index.filter(col("vType") === 0 && col("key") === key)

  /** Typed exact-key lookup for any value kind. */
  def lookupValue(index: DataFrame, v: graft.model.PropertyValue): DataFrame = {
    import graft.model.PropertyValue._
    val (t, k) = v match {
      case PVText(s)    => (0, s)
      case PVInteger(i) => (1, i.toString)
      case PVBinary(b)  => (2, b.map("%02x".format(_)).mkString)
      case PVJson(j)    => (3, j)
    }
    index.filter(col("vType") === t && col("key") === k)
  }

  /** All text entries under a prefix (Trie.hs:242-261 prefix). */
  def prefix(index: DataFrame, p: String): DataFrame =
    index.filter(col("vType") === 0 && col("key").startsWith(p))

  /** Prefix as an explicit sargable range — what `startsWith`
    * becomes after pushdown; exposed for callers building manual
    * bounds over sorted/bucketed layouts.
    */
  def prefixRange(keyCol: Column, p: String): Column =
    if (p.isEmpty) keyCol.isNotNull // empty prefix matches everything
    else if (p.last == Char.MaxValue) keyCol.startsWith(p) // no successor char
    else {
      val next = p.init + (p.last + 1).toChar
      keyCol >= p && keyCol < next
    }
}

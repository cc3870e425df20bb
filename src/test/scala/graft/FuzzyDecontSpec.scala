package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** MinHash-LSH fuzzy decontamination: near-dup matches against a
  * benchmark split, integer Jaccard verify.
  */
class FuzzyDecontSpec extends GraftSuite {
  import spark.implicits._

  private val benchText = "the quick brown fox jumps over the lazy dog again and again"
  private def corpus = Seq(
    (50L, benchText),                                              // benchmark (id % 50 == 0)
    (1L, benchText),                                               // exact copy → contaminated
    (2L, "the quick brown fox jumps over the lazy dog again and TWICE"), // light edit → near-dup
    (3L, "completely different text about spark shuffles and joins here"),
    (4L, "the quick brown cat sits under a table with different everything") // one shared shingle only
  ).toDF("doc_id", "text")

  test("exact and lightly-edited benchmark copies are flagged; others are not") {
    val out = Dedup.decontaminateFuzzy(corpus, "doc_id", col("text"),
      col("doc_id") % 50 === 0, minJaccardPermille = 500)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains(1L) && out(1L)._2 == 1000L, s"exact copy must score 1000: $out")
    assert(out.contains(2L) && out(2L)._2 >= 500L && out(2L)._2 < 1000L,
      s"light edit must land in [500,1000): $out")
    assert(!out.contains(3L) && !out.contains(4L),
      s"unrelated / single-shingle docs must not be flagged: $out")
  }

  test("the any-overlap decontaminate flags what fuzzy correctly ranks out") {
    // doc 4 shares shingles with the benchmark ("the quick brown")
    // → the blunt rule flags it, the fuzzy rule does not
    val blunt = Dedup.decontaminate(corpus, "doc_id", col("text"),
      col("doc_id") % 50 === 0).collect().map(_.getLong(0)).toSet
    assert(blunt.contains(4L))
  }

  test("simhashHammingPairs equals the brute-force all-pairs scan (pigeonhole complete)") {
    val docs = (1L to 60L)
      .map(i => (i, (1 to 12).map(j => s"w${(i * j * 7) % 19}").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(docs, "doc_id", col("text"), maxHamming = 3, bits = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Dedup.simhashByDoc(docs, "doc_id", col("text"), bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      d = java.lang.Long.bitCount(sh(a) ^ sh(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === want, "block candidates must find EVERY pair within the bound")
  }

  test("64-bit fingerprints: pigeonhole completeness holds on the second hash word") {
    val docs = (1L to 50L)
      .map(i => (i, (1 to 10).map(j => s"v${(i * j * 11) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(docs, "doc_id", col("text"), maxHamming = 3, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Dedup.simhashByDoc(docs, "doc_id", col("text"), bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      d = java.lang.Long.bitCount(sh(a) ^ sh(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === want, "64-bit block candidates must find every pair within the bound")
    // the low 32 bits are EXACTLY the 32-bit fingerprint (word 0),
    // so widening refines, never redefines, the narrow fingerprint
    val sh32 = Dedup.simhashByDoc(docs, "doc_id", col("text"), bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh.foreach { case (id, h64) => assert((h64 & 0xFFFFFFFFL) === sh32(id)) }
  }

  test("autoSimhashBits: 32 at gate scale, wider keys as candidates would go quadratic") {
    // gate/test corpora select the 32-bit manual default exactly
    assert(Dedup.autoSimhashBits(60) === 32)
    assert(Dedup.autoSimhashBits(2500) === 32)
    assert(Dedup.autoSimhashBits(8192) === 32)
    // past constant-occupancy for 8-bit keys the width grows ~log2(N)
    assert(Dedup.autoSimhashBits(16384) === 36)
    assert(Dedup.autoSimhashBits(50L * 1000 * 1000) === 64)
    // capped at the 64-bit long fingerprint
    assert(Dedup.autoSimhashBits(10L * 1000 * 1000 * 1000) === 64)
    // auto == manual at gate scale, end to end
    val docs = (1L to 60L)
      .map(i => (i, (1 to 12).map(j => s"w${(i * j * 7) % 19}").mkString(" ")))
      .toDF("doc_id", "text")
    val auto = Dedup.simhashHammingPairsAuto(docs, "doc_id", col("text"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val manual = Dedup.simhashHammingPairs(docs, "doc_id", col("text"), maxHamming = 3, bits = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto === manual)
  }

  test("simhashHammingPairs excludes pairs past the bound") {
    val out = Dedup.simhashHammingPairs(
      Seq((1L, "a b c d e f"), (2L, "q r s t u v w x y z")).toDF("doc_id", "text"),
      "doc_id", col("text"), maxHamming = 0, bits = 32).collect()
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("Manku permuted tables equal the brute-force pair set at every block count") {
    val docs = (1L to 60L)
      .map(i => (i, (1 to 12).map(j => s"w${(i * j * 7) % 19}").mkString(" ")))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashByDoc(docs, "doc_id", col("text"), bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      d = java.lang.Long.bitCount(sh(a) ^ sh(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    // recall is pigeonhole-exact regardless of the block count: 4
    // (degenerates to the single-block path), 6 (the gate), 8 (the cap)
    for (blocks <- Seq(4, 6, 8)) {
      val got = Dedup.simhashHammingPairsTables(docs, "doc_id", col("text"),
        maxHamming = 3, numBlocks = blocks, bits = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"numBlocks=$blocks must find EVERY pair within the bound")
    }
    // ragged split (64 % 6 != 0): widths differ by one, still exact —
    // covered by blocks=6 above; guards fail loud
    intercept[IllegalArgumentException](
      Dedup.simhashHammingPairsTables(docs, "doc_id", col("text"),
        maxHamming = 3, numBlocks = 3))
    intercept[IllegalArgumentException]( // 2 blocks at k=0: 64-bit combo key overflows a long
      Dedup.simhashHammingPairsTables(docs, "doc_id", col("text"),
        maxHamming = 0, numBlocks = 2))
  }

  test("autoSimhashBlocks steps up only past the single-block key cap (N ~ 2M)") {
    // width tier still suffices: stay at maxHamming+1 blocks (no table fan-out)
    assert(Dedup.autoSimhashBlocks(60) === 4)
    assert(Dedup.autoSimhashBlocks(2L * 1000 * 1000) === 4) // need 16 = the 16-bit cap exactly
    // past the cap: more blocks -> wider combination keys
    assert(Dedup.autoSimhashBlocks(3L * 1000 * 1000) === 5)   // need 17 <= 25
    assert(Dedup.autoSimhashBlocks(1L << 40) === 7)           // need 35 <= 36
    assert(Dedup.autoSimhashBlocks(Long.MaxValue) === 8)      // the table-budget cap
    // monotone in N
    val ns = Seq(1L, 1000L, 100000L, 2000000L, 10000000L, 1L << 30, 1L << 45, 1L << 60)
    val bs = ns.map(Dedup.autoSimhashBlocks(_))
    assert(bs === bs.sorted, s"block count must be monotone in corpus size: $bs")
  }

  test("scaled entry picks the width tier at small N, end-to-end identical") {
    val docs = (1L to 60L)
      .map(i => (i, (1 to 12).map(j => s"w${(i * j * 7) % 19}").mkString(" ")))
      .toDF("doc_id", "text")
    val scaled = Dedup.simhashHammingPairsScaled(docs, "doc_id", col("text"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val manual = Dedup.simhashHammingPairs(docs, "doc_id", col("text"), maxHamming = 3, bits = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scaled === manual)
  }

  test("cost-based tier dispatch: measured probe volumes pick the measured-faster scheme") {
    // the SCALE.md r13 A/B probes (candidates / keyed rows), where the
    // fixed tier measures FASTER at every probed N despite 11x-26x
    // more candidates — a width-saturation dispatch routed all to the
    // measurably slower tables plan
    val f25 = Dedup.chooseSimhashTables(366332499L, 10000000L, 32864699L, 25000000L)
    assert(!f25, "N=2.5M: fixed tier is the measured-cheaper plan")
    val f5 = Dedup.chooseSimhashTables(1129232865L, 20000000L, 69364163L, 50000000L)
    assert(!f5, "N=5M: fixed tier is still the measured-cheaper plan")
    val f10 = Dedup.chooseSimhashTables(3823287635L, 40000000L, 147738328L, 100000000L)
    assert(!f10, "N=10M: fixed still measures faster (78.6 vs 91.9 s) — honor it")
    // past the crossover the fixed tier's quadratic candidate term
    // dominates any table fan-out: ~N=50M estimates (fixed ~113B
    // candidates vs tables ~0.7B on 5x the rows)
    assert(Dedup.chooseSimhashTables(113000000000L, 200000000L, 700000000L, 1000000000L),
      "N=50M: candidate volume dominates; tables tier wins")
    // equal-cost degenerate (B == maxHamming+1: same keys, same rows)
    // stays on the fixed path — no gratuitous plan change
    assert(!Dedup.chooseSimhashTables(1000L, 100L, 1000L, 100L))
  }

  test("pricing short-circuit: tablesCannotWin implies the rule rejects tables for EVERY candT") {
    // the r14 single-pass probe numbers: at 10M the fixed tier's full
    // modeled cost (3.82B candidates + 64*40M rows) is just under the
    // tables tier's row cost alone (64*100M) — the short-circuit fires
    // and the candT aggregate (a 100M-row explode+shuffle) is skipped
    assert(Dedup.tablesCannotWin(3823287635L, 40000000L, 100000000L),
      "the 10M probe point must short-circuit")
    // consistency with the rule: wherever the bound fires, no candidate
    // volume can make chooseSimhashTables pick tables (candT >= 0, and
    // 0 is its best case)
    for ((cf, rf, rt) <- Seq(
        (3823287635L, 40000000L, 100000000L),
        (0L, 0L, 0L), (1000L, 100L, 200L), (1L << 40, 1L << 20, 1L << 26)))
      if (Dedup.tablesCannotWin(cf, rf, rt))
        assert(!Dedup.chooseSimhashTables(cf, rf, 0L, rt),
          s"bound fired but the rule could still pick tables at ($cf,$rf,$rt)")
    // and it must NOT fire where tables genuinely wins (the N=50M
    // regime from the dispatch spec above)
    assert(!Dedup.tablesCannotWin(113000000000L, 200000000L, 1000000000L),
      "past the crossover the exact candT must be priced")
  }

  test("scaled entry, saturated regime: cost dispatch runs and the pair set stays exact") {
    // force saturation at spec scale: maxHamming=7 -> 8-bit key cap,
    // targetBucketRows=1 -> need = ceil(log2 300) = 9 > 8. The
    // dispatcher prices BOTH schemes on shared 64-bit fingerprints and
    // either branch must return the brute-force pair set (the
    // dispatch-never-changes-results contract).
    val docs = (1L to 300L)
      .map(i => (i, (1 to 12).map(j => s"w${(i * j * 7) % 37}").mkString(" ")))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashByDoc(docs, "doc_id", col("text"), bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      d = java.lang.Long.bitCount(sh(a) ^ sh(b)) if d <= 7
    } yield (a, b, d.toLong)).toSet
    val got = Dedup.simhashHammingPairsScaled(docs, "doc_id", col("text"),
      maxHamming = 7, targetBucketRows = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "saturated-regime dispatch must stay pigeonhole-exact")
  }

  test("simhashCandidateVolume: exact sum-of-C(bucket,2), 0 on an empty corpus") {
    val keyed = Seq((0, 1L, 10L), (0, 1L, 11L), (0, 1L, 12L), (0, 2L, 13L), (1, 1L, 10L))
      .toDF("tbl", "key", "id").withColumn("simhash", lit(0L))
    assert(Dedup.simhashCandidateVolume(keyed) === 3L) // C(3,2) + C(1,2) + C(1,2)
    assert(Dedup.simhashCandidateVolume(keyed.filter(lit(false))) === 0L)
  }

  test("autoBands puts the S-curve midpoint at the threshold") {
    // midpoint of (b, r) is (1/b)^(1/r)
    def mid(b: Int, r: Int) = math.pow(1.0 / b, 1.0 / r)
    val (b1, r1) = Dedup.autoBands(16, 0.7)
    assert(b1 * r1 == 16)
    // no other divisor pair sits closer to 0.7
    val best = (1 to 16).filter(16 % _ == 0)
      .map(b => math.abs(mid(b, 16 / b) - 0.7)).min
    assert(math.abs(mid(b1, r1) - 0.7) == best)
    // a high threshold wants fewer bands x more rows, a low one the reverse
    val (bHi, _) = Dedup.autoBands(16, 0.95)
    val (bLo, _) = Dedup.autoBands(16, 0.3)
    assert(bHi < b1 || bHi == 1)
    assert(bLo > b1)
  }

  test("permille threshold is an exact integer cut") {
    // identical 12-token docs share all shingles: u = i → 1000·i >= p·i
    // for any p <= 1000, and max_j_permille = 1000 exactly
    val df = Seq((50L, benchText), (7L, benchText)).toDF("doc_id", "text")
    val out = Dedup.decontaminateFuzzy(df, "doc_id", col("text"),
      col("doc_id") % 50 === 0, minJaccardPermille = 1000).collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L && out.head.getLong(2) == 1000L)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Scale probe for SimHash Hamming blocking (SCALE.md evidence, not a
  * driver contract). Usage:
  * `runMain graft.ProbeSimhash <sfDir> [replicate]`.
  *
  * With no `replicate`, compares the fixed 32-bit width against the
  * auto-selected width (the r11 width-tier evidence). With
  * `replicate = R`, the corpus is blown up to N = docs x R with every
  * token salted PER REPLICA (so each replica's fingerprint is an
  * independent draw — plain copies would be Hamming-0 clusters and
  * measure true-pair volume, not blocking selectivity), and the probe
  * compares the capped single-block scheme (64-bit fingerprint,
  * 16-bit keys — what autoSimhashBits returns past N ~ 2M) against the
  * Manku permuted-table scheme at the auto block count: candidate
  * volume (Σ C(bucket, 2) over (table, key) buckets), verified pairs,
  * and wall time.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val replicate = if (args.length > 1) args(1).toInt else 1
    val spark = graft.core.Graft.session("graft-probe-simhash",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (if (replicate == 1) base.select(col("doc_id"), col("text"))
      else base.crossJoin(spark.range(replicate).select(col("id").as("__r")))
        .select((col("doc_id") * replicate + col("__r")).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("__r"))), " ").as("text"))
        // the crossJoin preserves the base table's partitioning — ONE
        // split for a single-file sf0.1 parquet — which would serialize
        // every downstream tokenize/fingerprint map stage on one task
        // (observed: a 10 M-doc fingerprint pass pinned to 1 core for
        // 19+ min). A real corpus arrives in many splits; make the
        // replica look like one.
        .repartition(256))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = docs.count()

    def volume(keyed: org.apache.spark.sql.DataFrame): Long =
      // Column `/` is DOUBLE division — keep the count integral and
      // halve on the driver; coalesce because sum over an EMPTY keyed
      // frame is NULL (a degenerate corpus must print candidates=0,
      // not NPE)
      keyed.groupBy(col("tbl"), col("key")).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)))
        .first().getLong(0) / 2

    if (replicate == 1) {
      val auto = Dedup.autoSimhashBits(n)
      for (bits <- Seq(32, auto).distinct) {
        val t0 = System.nanoTime()
        val pairs = Dedup.simhashHammingPairs(docs, "doc_id", col("text"),
          maxHamming = 3, bits = bits).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val cand = volume(Dedup.simhashBlockKeys(
          Dedup.simhashByDoc(docs, "doc_id", col("text"), bits), 3, bits))
        println(f"[probe] n=$n%d bits=$bits%d (auto=$auto%d) candidates=$cand%d " +
          f"pairs=$pairs%d time=$sec%.2f s")
      }
    } else if (args.length > 2 && args(2) == "scaled") {
      // r14 single-pass evidence: the full scaled ENTRY (tier count +
      // pricing + dispatch + winner execution) vs the BARE chosen
      // scheme at this N, both end-to-end from the same materialized
      // corpus. Criterion (r13 verdict item 2): entry wall within
      // ~1.2x of the bare scheme — it was ~2x by construction when
      // the entry re-fingerprinted the corpus for the returned plan.
      // 3 reps (single-shot walls on this box swing +-3x; report all,
      // median in SCALE.md).
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val pairsScaled = Dedup.simhashHammingPairsScaled(
          docs, "doc_id", col("text")).count()
        val tScaled = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val pairsBare = Dedup.simhashHammingPairs(docs, "doc_id", col("text"),
          maxHamming = 3, bits = 64).count()
        val tBare = (System.nanoTime() - t1) / 1e9
        println(f"[probe] rep=$rep n=$n%d scaled-entry=$tScaled%.2f s " +
          f"(pairs=$pairsScaled%d) bare-fixed64=$tBare%.2f s (pairs=$pairsBare%d) " +
          f"ratio=${tScaled / tBare}%.3f")
      }
    } else {
      // fingerprint ONCE (the shared cost), then price each blocking
      val sh = Dedup.simhashByDoc(docs, "doc_id", col("text"), 64)
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      sh.count()
      val autoB = Dedup.autoSimhashBlocks(n)
      val schemes = Seq(
        ("fixed-4x16bit", Dedup.simhashBlockKeys(sh, 3, 64)),
        (s"tables-B$autoB", Dedup.simhashComboKeys(sh, 3, autoB, 64)))
      // what simhashHammingPairsScaled's cost model would dispatch to
      // at this N — printed beside the measured walls so SCALE.md can
      // show decision-vs-measured on one row
      val nTables = (0 until autoB).combinations(autoB - 3).size.toLong
      val candF = Dedup.simhashCandidateVolume(schemes(0)._2)
      val candT = Dedup.simhashCandidateVolume(schemes(1)._2)
      val choice = if (Dedup.chooseSimhashTables(candF, n * 4, candT, n * nTables))
        s"tables-B$autoB" else "fixed-4x16bit"
      println(s"[probe] n=$n dispatch=$choice (candF=$candF candT=$candT " +
        s"rowsF=${n * 4} rowsT=${n * nTables} rowCost=${Dedup.simhashShuffleRowCost})")
      for ((name, keyed) <- schemes) {
        val t0 = System.nanoTime()
        val cand = volume(keyed)
        val a = keyed.select(col("tbl"), col("key"), col("id").as("da"), col("simhash").as("sa"))
        val b = keyed.select(col("tbl"), col("key"), col("id").as("db"), col("simhash").as("sb"))
        val pairs = a.join(b, Seq("tbl", "key")).filter(col("da") < col("db"))
          .filter(expr("bit_count(sa ^ sb)") <= 3)
          .select(col("da"), col("db")).distinct().count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] n=$n%d scheme=$name candidates=$cand%d " +
          f"pairs=$pairs%d time=$sec%.2f s")
      }
    }
    spark.stop()
  }
}

package graft

import graft.queries.Catalog

/** Plan-shape assertions: the optimizations that matter at 100 TB
  * must be visible in the physical plan, not assumed.
  */
class PlanSpec extends GraftSuite {

  private def plan(name: String): String =
    Catalog.byName(name).build(spark, sf001).queryExecution.executedPlan.toString

  test("q_filter_scan: predicate and projection reach the parquet scan") {
    val p = plan("q_filter_scan")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"expected pushed filter on l_quantity in:\n$p")
    assert(p.contains("ReadSchema") &&
      !p.contains("l_extendedprice"), "projection must prune unused columns")
  }

  test("q_point_lookup: key predicate pushed down") {
    val p = plan("q_point_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]") ||
      (p.contains("EqualTo(c_custkey,42)") && p.contains("PushedFilters")), p)
  }

  test("q_join_dims: small dimension joins are broadcast") {
    val p = plan("q_join_dims")
    assert(p.contains("BroadcastHashJoin"), "nation join should broadcast")
  }

  test("q1_agg: partial aggregation before the shuffle (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate") && p.contains("partial"),
      "expect partial HashAggregate below the exchange")
  }

  test("hot scans are vectorized and UDF-free") {
    // higher-order functions (filter/transform lambdas) are expression
    // -interpreted in Spark — fine; what must hold: vectorized parquet
    // read, codegen'd stages ("*(n)" markers), no interpreted UDF nodes
    val p = plan("q_text_quality")
    assert(p.contains("Batched: true"), "vectorized parquet read")
    assert(p.contains("*("), "whole-stage codegen present")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "no black-box UDFs in the hot path")
  }

  test("per-group limit uses the window-group-limit pushdown") {
    // Spark 3.5+ inserts WindowGroupLimit below the window for
    // rank/row_number <= k filters — top-k per group without ranking
    // every row. Load-bearing for newest-first limits on hot nodes.
    val p = plan("q_pergroup_limit")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$p")
  }

  test("q_semi_join / q_anti_join use join strategies, not subquery loops") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("unused target-node join is eliminated via the uniqueness rule") {
    import org.apache.spark.sql.functions.col
    import graft.operators.QueryStep
    import graft.operators.QueryStep.{RelationStep, OUT}
    val g = graft.core.TpchGraph.snapshot(spark, sf0001)
    val step = QueryStep(g, g.nodes.filter(col("label") === "customer"),
      RelationStep(relTypes = Seq("placed"), direction = OUT))
    // ids only -> the per-id grouped node lookup proves uniqueness and
    // EliminateUnusedUniqueJoin removes the target join entirely
    val pruned = step.select("src_id", "rel_id", "tgt_id")
    val prunedPlan = pruned.queryExecution.optimizedPlan.toString
    assert(!prunedPlan.contains("Join LeftOuter"), s"target join must be eliminated:\n$prunedPlan")
    // ... but consuming tgt_props keeps the join (and the result is populated)
    val kept = step.select("tgt_id", "tgt_props")
    assert(kept.queryExecution.optimizedPlan.toString.contains("Join LeftOuter"))
    assert(kept.filter(col("tgt_props").isNotNull).count() > 0)
    // elimination does not change results
    assert(pruned.count() == step.count())
  }

  test("q_decontaminate: the benchmark side broadcasts (corpus never shuffles)") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"benchmark shingles must broadcast:\n$p")
  }

  test("q_sketch_hll: registers reduce map-side before the exchange") {
    val p = plan("q_sketch_hll")
    assert(p.contains("partial_max") || (p.contains("partial") && p.contains("max")),
      s"expect partial max below the exchange:\n$p")
  }

  test("redaction and BPE counting stay codegen'd and UDF-free") {
    Seq("q_text_redact", "q_text_bpe_tokens", "q_text_repetition").foreach { q =>
      val p = plan(q)
      assert(p.contains("*(") && !p.contains("ScalaUDF"), s"$q must stay in codegen:\n$p")
    }
  }

  test("prefixRange bounds reach the parquet scan as pushed range filters") {
    // startsWith on a published index column must arrive at the scan
    // as sargable >=/< bounds — on a sorted/bucketed layout that is
    // what lets row groups skip (the trie-descend analog)
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("idx-prefix").toString
    spark.range(0, 1000).selectExpr("concat('key', id) AS key", "id AS node")
      .write.mode("overwrite").parquet(dir)
    val ranged = spark.read.parquet(dir)
      .filter(graft.operators.UniqueIndex.prefixRange(col("key"), "key1"))
    val p = ranged.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(key,key1)") && p.contains("LessThan(key,key2)"),
      s"expected pushed >=/< bounds in:\n$p")
    // and the range form selects exactly the startsWith rows
    val viaStarts = spark.read.parquet(dir)
      .filter(col("key").startsWith("key1")).count()
    assert(ranged.count() == viaStarts && viaStarts == 111L)
  }

  test("edge label filters prune non-matching union branches (no fact-table scan)") {
    // every TpchGraph edge branch carries a top-level literal label,
    // so a label filter constant-folds the others away — the
    // in-memory analog of label-partition pruning on a published
    // snapshot. A geography traversal must never scan lineitem.
    import org.apache.spark.sql.functions.col
    val g = graft.core.TpchGraph.snapshot(spark, sf0001)
    val p = g.edges.filter(col("label").isin("in_nation", "in_region"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("lineitem"), s"label-pruned edge scan must skip the fact table:\n$p")
    assert(!p.contains("orders"), "placed branch folds away too")
  }

  test("q_quality_gopher: windows are doc-partitioned, never global") {
    val p = plan("q_quality_gopher")
    assert(p.contains("Window"), s"coverage needs the per-doc argmax window:\n${p.take(500)}")
    assert(!p.contains("SinglePartition"),
      s"a global window would serialize the corpus through one task:\n$p")
    assert(!p.contains("ScalaUDF"), "coverage must stay expression-only")
  }

  test("BPE pair counting combines map-side before the exchange") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables(spark, sf001).documents
    val words = graft.pipeline.BpeTrain.wordVocab(docs, col("text"))
    Seq(words, graft.pipeline.BpeTrain.pairCounts(words)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("partial_count") || p.contains("partial_sum") ||
        (p.contains("HashAggregate") && p.contains("partial")),
        s"vocab/pair aggregation must combine before shuffling:\n${p.take(2000)}")
    }
  }

  test("deterministic walks never plan a cartesian product") {
    val p = plan("q_graph_walks")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"walk hops must be equi-joins on the frontier:\n${p.take(2000)}")
  }

  test("skip-gram pairs join on exploded offsets — no post-join band filter") {
    // the join OUTPUT is the pair set: amplification through the
    // exchange is exactly 2·window, never (walkLen+1)² per walk
    val p = plan("q_graph_walk_pairs")
    assert(!p.contains("abs("),
      s"no |Δstep| band filter may survive in the physical plan:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an equi-join:\n${p.take(2000)}")
  }

  test("round-10 graph operators plan equi-joins only (no cartesian anywhere)") {
    Seq("q_link_prediction", "q_graph_assortativity", "q_graph_feature_prop",
      "q_tri_local").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must plan keyed joins only:\n${p.take(2000)}")
    }
  }

  test("q_tri_local: both attribution passes use the codegen'd sorted merges") {
    val p = plan("q_tri_local")
    assert(p.contains("sorted_intersect"),
      s"apex pass must use the two-pointer expression, not array_intersect:\n${p.take(2000)}")
    assert(!p.contains("array_intersect"),
      s"no hash-set array_intersect may survive in the hot path:\n${p.take(2000)}")
  }

  test("q_link_prediction: wedge aggregation combines map-side before the exchange") {
    val p = plan("q_link_prediction")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"CN/AA sums must partial-aggregate before shuffling:\n${p.take(2000)}")
  }

  test("q_select_dsir: the weight table broadcasts, candidates never collect") {
    val p = plan("q_select_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"the 64-row weight table must ride a broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), "no cartesian in the scoring path")
  }

  test("q_decontaminate_fuzzy: benchmark bands broadcast, no cartesian") {
    val p = plan("q_decontaminate_fuzzy")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark band/shingle sides must broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), "candidates come from band equi-joins only")
  }

  test("selection/mixture/packing never plan an unpartitioned window") {
    // the two-phase rank/prefix machinery must keep every window
    // partitioned — a partition-less Window over the corpus is the
    // 100 TB single-task funnel
    Seq("q_select_dsir", "q_mix_alpha", "q_text_pack_global").foreach { q =>
      val exec = Catalog.byName(q).build(spark, sf001).queryExecution.executedPlan
      val bad = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$q plans an unpartitioned window:\n${bad.mkString("\n")}")
    }
  }

  test("q_dedup_semantic: assignment is the codegen'd nearest_cell, pairs equi-join on cell") {
    val p = plan("q_dedup_semantic")
    assert(p.contains("nearest_cell"),
      s"cell assignment must be the codegen expression:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), "the pair join must be a cell equi-join")
  }

  test("q_text_winnow: selection is one per-doc window, no self-join") {
    val p = plan("q_text_winnow")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"),
      s"winnowing must not join at all — one window function + distinct:\n${p.take(2000)}")
  }

  test("round-11 gates: equi-joins only, no cartesian, no unpartitioned window") {
    Seq("q_text_winnow_incremental", "q_text_winnow_overlap",
      "q_pipeline_pretrain_incremental", "q_dedup_simhash_hamming_wide",
      "q_kcore").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must plan equi-joins only:\n${p.take(1500)}")
      // the per-doc winnow window is partitioned; nothing here may
      // funnel the corpus through a single-partition WindowExec
      assert(!p.contains("Window [") || !p.contains("SinglePartition"),
        s"$q plans an unpartitioned window:\n${p.take(1500)}")
    }
  }

  test("round-12 gates: equi-joins only, no cartesian, no unpartitioned window") {
    Seq("q_dedup_simhash_tables", "q_dedup_simhash_scaled",
      "q_mvcc_purge_aborted", "q_text_winnow_overlap_permille",
      "q_text_winnow_delete").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must plan equi-joins only:\n${p.take(1500)}")
      // every WindowExec must carry partition columns — checked on the
      // physical tree, not plan text, because the permille gate
      // legitimately has a SinglePartition exchange elsewhere (the
      // 1-row global doc count)
      Catalog.byName(q).build(spark, sf001).queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q plans an unpartitioned window: $w"))
    }
    // the permille cap's doc count must ride in as a BROADCAST 1-row
    // nested-loop (the one legal BNLJ here — a single-row stats join),
    // never a shuffle
    val p = plan("q_text_winnow_overlap_permille")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row doc-count join must broadcast:\n${p.take(1500)}")
    // the permuted-table candidate join is a plain equi-join on
    // (tbl, key): a hash/merge join keyed by the explode output (AQE
    // legitimately broadcasts the small side at gate scale; what's
    // pinned is that it stays an EQUI-join with the verify filter on
    // the join output, never a nested loop)
    val t = plan("q_dedup_simhash_tables")
    assert(t.contains("Join") && !t.contains("BroadcastNestedLoopJoin"),
      s"tables candidates must be an equi-join:\n${t.take(1500)}")
  }

}

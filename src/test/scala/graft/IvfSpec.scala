package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ivf, Similarity}

class IvfSpec extends GraftSuite {

  private lazy val emb = graft.sources.Tables(spark, sf001).embeddings

  test("IVF partitions the corpus into non-degenerate cells") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val cells = emb.select(Ivf.assign(col("embedding"), idx).as("cell"))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.size >= 4, s"expected several occupied cells, got $cells")
    assert(cells.values.max < emb.count(), "not all vectors in one cell")
  }

  test("probed IVF search recalls most of the brute-force top-k") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val rest = emb.filter(col("vec_id") =!= 0L)
    val exact = Similarity.topK(rest, "vec_id", "embedding", q.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Ivf.topK(spark, rest, "vec_id", "embedding", idx, q, 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size
    assert(ivf.size == 10)
    assert(recall >= 5, s"recall@10 with 3/8 probes should be decent, got $recall/10")
    // full probe = exact
    val all = Ivf.topK(spark, rest, "vec_id", "embedding", idx, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(all == exact, "probing every cell must equal brute force")
  }

  test("NearestCell assignment equals the per-centroid struct-min formulation") {
    // pins the O(1)-tree expression to the semantics of the explicit
    // argmin it replaced: min distance, ties to the lower cell id
    graft.functions.DotFloat.register(spark)
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val structMin = {
      val scored = idx.centroids.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x.toDouble * x.toDouble).sum
        struct(
          (lit(c2) - lit(2.0) * graft.functions.DotFloat.col(
            col("embedding"), typedLit(c.toSeq))).as("d"),
          lit(i).as("cell"))
      }
      array_min(array(scored.toIndexedSeq: _*)).getField("cell")
    }
    val diff = emb.select(col("vec_id"),
        Ivf.assign(col("embedding"), idx).as("a"), structMin.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, s"$diff assignments differ between the two formulations")
  }

  test("cell-partitioned layout: probes prune partitions and preserve results") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf-part").toString
    Ivf.writePartitioned(emb, "embedding", idx, path)

    // one directory per occupied cell on disk
    val cellDirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).toSet
    val occupied = emb.select(Ivf.assign(col("embedding"), idx).as("cell"))
      .distinct().collect().map(r => s"cell=${r.getInt(0)}").toSet
    assert(cellDirs == occupied, "layout is partitioned by trained cell id")

    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray

    // full probe over the layout == brute force (same contract as topK)
    val exact = Similarity.topK(emb.filter(col("vec_id") =!= 0L),
        "vec_id", "embedding", q.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val full = Ivf.topKPartitioned(spark, path, "vec_id", "embedding",
        idx, q, 10, nprobe = 8, pred = col("vec_id") =!= 0L)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact, "probing every partition must equal brute force")

    // partial probe reads ONLY the probed directories: the cell filter
    // must be a partition filter (selectedPartitions == nprobe), and
    // cell assignment must not be recomputed at query time
    val probed = Ivf.topKPartitioned(spark, path, "vec_id", "embedding",
      idx, q, 10, nprobe = 2, pred = col("vec_id") =!= 0L)
    val scans = probed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "plan reads files")
    assert(scans.map(_.relation.location.inputFiles.length).sum > 0)
    val partsRead = scans.map(_.selectedPartitions.partitionCount).sum
    assert(partsRead == 2, s"probe must read exactly nprobe partitions, read $partsRead")
    assert(!probed.queryExecution.executedPlan.toString.contains("nearest_cell"),
      "cell assignment happens at publish time, not query time")
    // and the probed results agree with assigning cells on the fly
    val onTheFly = Ivf.topK(spark, emb.filter(col("vec_id") =!= 0L),
        "vec_id", "embedding", idx, q, 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    val viaLayout = probed.collect().map(_.getLong(0)).toSeq
    assert(viaLayout == onTheFly, "layout changes I/O, not semantics")
  }

  test("appendPartitioned: batch surfaces exactly, base files untouched") {
    val base  = emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") === 0L)
    val batch = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0L)
    val idx = Ivf.train(spark, base, "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf-inc").toString
    Ivf.writePartitioned(base, "embedding", idx, path)
    def files() = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(path), Array("parquet"), true)
    val baseFiles = files().toArray(Array.empty[java.io.File]).map(_.getPath).toSet
    Ivf.appendPartitioned(batch, "embedding", idx, path)

    // append-only: every base file still present, new files added
    val afterFiles = files().toArray(Array.empty[java.io.File]).map(_.getPath).toSet
    assert(baseFiles.subsetOf(afterFiles), "append must not rewrite base files")
    assert(afterFiles.size > baseFiles.size, "append must add batch files")

    // full probe over the appended layout == brute force over base ∪ batch
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val exact = Similarity.topK(emb.filter(col("vec_id") =!= 0L),
        "vec_id", "embedding", q.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val got = Ivf.topKPartitioned(spark, path, "vec_id", "embedding",
        idx, q, 10, nprobe = 8, pred = col("vec_id") =!= 0L)
      .collect().map(_.getLong(0)).toSet
    assert(got == exact, "appended vectors must surface exactly in probed search")
    // ...and at least one appended vector is actually in the top-k,
    // otherwise this test proves nothing about the append
    assert(got.exists(id => id % 5 == 0), s"no batch vector in top-10: $got")
  }

  test("train's packed centroid update matches a driver-side Lloyd reference") {
    // the r8 update re-packs per-cell means distributed-side so the
    // driver collects nlist ROWS, not nlist×dim — this pins that the
    // re-pack did not change the math (tolerance: distributed avg
    // sums in shuffle order, so ulp-level drift is allowed)
    val small = emb.filter(col("vec_id") < 100)
    val idx = Ivf.train(spark, small, "vec_id", "embedding", nlist = 4, iters = 2)
    val vecs = small.orderBy(col("vec_id")).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    var cents = vecs.take(4)
    (1 to 2).foreach { _ =>
      def cellOf(v: Array[Float]): Int = {
        var best = Double.PositiveInfinity; var bi = 0
        cents.indices.foreach { i =>
          var c2 = 0.0; var dot = 0.0
          cents(i).indices.foreach { d =>
            c2 += cents(i)(d).toDouble * cents(i)(d).toDouble
            dot += cents(i)(d).toDouble * v(d).toDouble
          }
          val dist = c2 - 2.0 * dot
          if (dist < best) { best = dist; bi = i }
        }
        bi
      }
      val grouped = vecs.groupBy(cellOf)
      cents = cents.zipWithIndex.map { case (c, i) =>
        grouped.get(i).map { vs =>
          Array.tabulate(c.length)(d => (vs.map(_(d).toDouble).sum / vs.length).toFloat)
        }.getOrElse(c)
      }
    }
    idx.centroids.zip(cents).zipWithIndex.foreach { case ((got, want), i) =>
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-5f, s"centroid $i drifted: $g vs $w")
      }
    }
  }

  test("a maxTrainRows cap samples deterministically and still trains a usable index") {
    val capped = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8, maxTrainRows = 100)
    val again  = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8, maxTrainRows = 100)
    assert(capped.centroids.flatten.toSeq == again.centroids.flatten.toSeq,
      "the hash sample must be deterministic")
    // ...and assignments over the FULL corpus remain well-formed
    val cells = emb.select(Ivf.assign(col("embedding"), capped).as("cell"))
      .groupBy("cell").count().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(cells.length >= 4, "capped training still spreads the corpus")
  }

  test("filtered (hybrid) search: predicate pushed to the scan under partition pruning") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf-filt").toString
    Ivf.writePartitioned(emb, "embedding", idx, path)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray

    val filtered = Ivf.topKPartitioned(spark, path, "vec_id", "embedding",
      idx, q, 10, nprobe = 2, pred = col("label") === 3 && col("vec_id") =!= 0L)
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "plan reads files")
    // the cell filter prunes partitions; the label filter reaches the
    // parquet reader as a pushed data filter (row-group stats skipping)
    assert(scans.map(_.selectedPartitions.partitionCount).sum == 2,
      "hybrid search must keep the nprobe partition pruning")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("EqualTo(label,3)"),
      s"label predicate must be pushed to the scan, got: $pushed")

    // semantics: equal to filter-then-search over the probed cells,
    // never search-then-filter (which would return < k rows)
    val cells = Ivf.probeOrder(idx, q).take(2)
    val expect = emb
      .withColumn("cell", Ivf.assign(col("embedding"), idx))
      .filter(col("cell").isin(cells: _*) && col("label") === 3 && col("vec_id") =!= 0L)
      .withColumn("cos", round(graft.functions.CosineSim.col(col("embedding"),
        typedLit(q.toSeq)), 6))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(filtered.select("vec_id").collect().map(_.getLong(0)).toSeq == expect)
    assert(expect.nonEmpty, "gate corpus must have label=3 rows in the probed cells")
  }

  test("recallAtK: 1.0 at full probe, monotone in nprobe, matches a hand count") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf-recall").toString
    Ivf.writePartitioned(emb, "embedding", idx, path)
    val qs = emb.filter(col("vec_id") < 8)
    def meanAt(np: Int): Double =
      Ivf.recallAtK(spark, path, qs, "vec_id", "embedding", "vec_id", "embedding",
        idx, k = 10, nprobe = np, pairFilter = col("q_id") =!= col("vec_id"))
        .agg(avg(col("recall"))).head().getDouble(0)

    // probing every cell IS the ground truth
    assert(meanAt(8) == 1.0)
    // candidate sets are prefix-nested in nprobe, so recall is monotone
    val series = Seq(1, 2, 4, 8).map(meanAt)
    series.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b + 1e-9, s"recall must be monotone in nprobe: $series")
    }
    assert(series.forall(r => r >= 0.0 && r <= 1.0))

    // per-query rows carry (hits, n, recall) consistently
    val rows = Ivf.recallAtK(spark, path, qs, "vec_id", "embedding",
      "vec_id", "embedding", idx, k = 10, nprobe = 2,
      pairFilter = col("q_id") =!= col("vec_id")).collect()
    assert(rows.length == 8, "one row per query")
    rows.foreach { r =>
      val (hits, n, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n == 10, "sf0.01 corpus is larger than k, so n == k")
      assert(hits >= 0 && hits <= n)
      assert(math.abs(rec - hits.toDouble / n) < 1e-6)
    }
  }

  test("nprobeForRecall finds the smallest doubling nprobe meeting the target") {
    val idx = Ivf.train(spark, emb, "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf-tune").toString
    Ivf.writePartitioned(emb, "embedding", idx, path)
    val qs = emb.filter(col("vec_id") < 8)

    val (np, mean) = Ivf.nprobeForRecall(spark, path, qs, "vec_id", "embedding",
      "vec_id", "embedding", idx, k = 10, targetRecall = 1.0,
      pairFilter = col("q_id") =!= col("vec_id"))
    assert(mean >= 1.0 - 1e-9 || np == idx.nlist,
      s"tuner must meet the target or hit nlist, got ($np, $mean)")
    assert(Seq(1, 2, 4, 8).contains(np), s"doubling search, got $np")
    // a trivial target is met by the first candidate
    val (np0, mean0) = Ivf.nprobeForRecall(spark, path, qs, "vec_id", "embedding",
      "vec_id", "embedding", idx, k = 10, targetRecall = 0.0,
      pairFilter = col("q_id") =!= col("vec_id"))
    assert(np0 == 1 && mean0 >= 0.0)

    // a NON-empty sample whose ground-truth leg measures nothing (the
    // pairFilter rejects every pair) must fail loud, not report the
    // unmeasured (1, 1.0) of a perfectly tuned layout
    intercept[IllegalArgumentException] {
      Ivf.nprobeForRecall(spark, path, qs, "vec_id", "embedding",
        "vec_id", "embedding", idx, k = 10, targetRecall = 0.9,
        pairFilter = lit(false))
    }
    // an empty sample IS vacuously tuned
    val (npE, meanE) = Ivf.nprobeForRecall(spark, path, qs.filter(lit(false)),
      "vec_id", "embedding", "vec_id", "embedding", idx, k = 10, targetRecall = 0.9)
    assert(npE == 1 && meanE == 1.0)
  }

  test("IVF stays viable at realistic cell counts (nlist=1024)") {
    // the per-centroid expression tree this replaced would exceed
    // Janino/plan limits here; NearestCell is one expression at any nlist
    val emb2 = graft.sources.Tables(spark, sf01).embeddings
    val idx = Ivf.train(spark, emb2, "vec_id", "embedding", nlist = 1024, iters = 1)
    assert(idx.nlist == 1024)
    val cells = emb2.select(Ivf.assign(col("embedding"), idx).as("cell"))
    val occupied = cells.groupBy("cell").count()
    assert(occupied.count() >= 128, "corpus spreads across many cells")
    val mm = cells.agg(min("cell"), max("cell")).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 1024, "cells in range")

    val q = emb2.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val rest = emb2.filter(col("vec_id") =!= 0L)
    val exact = Similarity.topK(rest, "vec_id", "embedding", q.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    val all = Ivf.topK(spark, rest, "vec_id", "embedding", idx, q, 10, nprobe = 1024)
      .collect().map(_.getLong(0)).toSet
    assert(all == exact, "probing every cell must equal brute force at nlist=1024")
  }
}

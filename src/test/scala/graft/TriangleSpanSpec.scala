package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics
import graft.pipeline.Dedup

/** Triangle counting (degree-ordered) and span-level dedup. */
class TriangleSpanSpec extends GraftSuite {
  import spark.implicits._

  test("triangles: K4 has 4, a star has 0, direction/dups/loops ignored") {
    val k4 = (for (i <- 1 to 4; j <- 1 to 4 if i != j) yield (i.toLong, j.toLong))
      .toDF("src", "dst") // both directions + implicit dedup
    assert(GraphAnalytics.triangles(k4).count() == 4)

    val star = (2 to 10).map(i => (1L, i.toLong)).toDF("src", "dst")
    assert(GraphAnalytics.triangles(star).count() == 0)

    val loops = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(GraphAnalytics.triangles(loops).count() == 1)
  }

  test("triangles: each triangle appears exactly once with a<deg-order source") {
    // two triangles sharing an edge: {1,2,3}, {2,3,4}
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val tris = GraphAnalytics.triangles(e)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => Set(a, b, c) }.toSeq
    assert(tris.size == 2 && tris.toSet == Set(Set(1L, 2L, 3L), Set(2L, 3L, 4L)))
  }

  test("triangles: hub graph keeps the wedge join bounded (orientation works)") {
    // hub 0 connected to 1..40, plus ring edges i-(i+1): triangles =
    // one per ring edge incident to the hub
    val hub = (1 to 40).map(i => (0L, i.toLong))
    val ring = (1 until 40).map(i => (i.toLong, (i + 1).toLong))
    val tris = GraphAnalytics.triangles((hub ++ ring).toDF("src", "dst"))
    assert(tris.count() == 39)
  }

  test("triangleCount == triangles().count() on every fixture, incl. empty") {
    val k4 = (for (i <- 1 to 4; j <- 1 to 4 if i != j) yield (i.toLong, j.toLong))
      .toDF("src", "dst")
    val star = (2 to 10).map(i => (1L, i.toLong)).toDF("src", "dst")
    val shared = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val hub = ((1 to 40).map(i => (0L, i.toLong)) ++
      (1 until 40).map(i => (i.toLong, (i + 1).toLong))).toDF("src", "dst")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    for (g <- Seq(k4, star, shared, hub, empty)) {
      val viaList = GraphAnalytics.triangles(g).count()
      val viaAdj = GraphAnalytics.triangleCount(g).as[Long].head()
      assert(viaAdj === viaList)
    }
  }

  test("clustering coefficients: K4 all 1.0, star hub 0, participation sums to 3x") {
    def byId(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val k4 = (for (i <- 1 to 4; j <- 1 to 4 if i != j) yield (i.toLong, j.toLong))
      .toDF("src", "dst")
    val ck4 = byId(GraphAnalytics.clusteringCoefficients(k4))
    assert(ck4.values.forall { case (deg, tri, lcc) => deg == 3 && tri == 3 && lcc == 1000000L })
    assert(ck4.values.map(_._2).sum === 3L * GraphAnalytics.triangles(k4).count())

    val star = (2 to 10).map(i => (1L, i.toLong)).toDF("src", "dst")
    val cs = byId(GraphAnalytics.clusteringCoefficients(star))
    assert(cs(1L) === ((9L, 0L, 0L)), "hub: 9 neighbors, no closed wedge")
    assert((2L to 10L).forall(cs(_) === ((1L, 0L, 0L))), "leaves: deg 1, lcc defined as 0")

    // two triangles sharing an edge: shared-edge vertices see 2 of 3
    // possible closed wedges -> lcc = 2/3
    val shared = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val csh = byId(GraphAnalytics.clusteringCoefficients(shared))
    assert(csh(2L) === ((3L, 2L, 666667L)) && csh(3L) === ((3L, 2L, 666667L)))
    assert(csh(1L) === ((2L, 1L, 1000000L)) && csh(4L) === ((2L, 1L, 1000000L)))
  }

  test("positionalSpans: every occurrence kept, short docs contribute nothing") {
    val docs = Seq(
      (1L, "a b a b a b"), // spans of 4: "a b a b" x2 (overlapping), "b a b a"
      (2L, "a b c"),       // shorter than n=4 -> nothing
      (3L, "a b a b x y")
    ).toDF("doc_id", "text")
    val spans = Dedup.positionalSpans(docs, "doc_id", col("text"), 4)
      .as[(Long, String)].collect().toSeq
    assert(!spans.exists(_._1 == 2L))
    assert(spans.count(_ == (1L, "a b a b")) == 2, "within-doc repeats preserved")
    assert(spans.count(_._2 == "a b a b") == 3)
  }

  test("topRepeatedSpans: winners by (occ, hash), text resolved, minDocs honored") {
    val docs = Seq(
      (1L, "x y z w q r"),
      (2L, "x y z w a b"),
      (3L, "x y z w c d"),
      (4L, "only once here nothing shared")
    ).toDF("doc_id", "text")
    val top = Dedup.topRepeatedSpans(docs, "doc_id", col("text"), n = 4, minDocs = 2, k = 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(top.contains(("x y z w", 3L, 3L)))
    assert(top.forall(_._2 >= 2), "minDocs filter")
    assert(!top.exists(_._1.contains("only once")))
  }

  test("repeatedSpanHashes shuffles hashes, never span strings") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val plan = Dedup.repeatedSpanHashes(docs, "doc_id", col("text"), 4, 2)
      .queryExecution.executedPlan.toString
    // the exchange below the aggregate must key on the hash, and the
    // span string must not survive past the hash projection
    assert(plan.contains("hashpartitioning(h#") || plan.contains("hashpartitioning(h "), plan)
  }
}

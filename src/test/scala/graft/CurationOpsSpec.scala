package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sketch, TextOps}

/** Round-3 curation operators: near-dup clustering, benchmark
  * decontamination, HLL cardinality, PII redaction, repetition
  * features.
  */
class CurationOpsSpec extends GraftSuite {

  import spark.implicits._

  test("clusterPairs groups transitively and picks the minimum as canonical") {
    // chain 1-2-3 (1!~3 directly) plus isolated pair 7-8: pairs alone
    // would keep {1,7} but drop 2,3,8 only via transitivity
    val pairs = Seq((2L, 1L), (2L, 3L), (7L, 8L)).toDF("da", "db")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("clusterPairs matches GraphX connected components on a random pair graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.toDF("da", "db")
    val ours = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tuples = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val g = org.apache.spark.graphx.Graph.fromEdgeTuples(
      spark.sparkContext.parallelize(tuples), 0)
    val gx = g.connectedComponents().vertices.collect().toMap
    assert(ours.keySet == gx.keySet)
    assert(ours.forall { case (id, c) => gx(id) == c },
      "HashMin canonical == GraphX component (min id)")
  }

  test("clusterPairs and decontaminate degrade to empty on empty inputs") {
    val noPairs = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.clusterPairs(noPairs).isEmpty, "no pairs -> no clusters")
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(docs, "doc_id", col("text"), lit(false)).isEmpty,
      "no benchmark docs -> nothing contaminated")
  }

  test("decontaminate flags exactly the docs sharing shingles with the benchmark set") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"), // benchmark
      (2L, "the quick brown fox jumps low"),  // shares "the quick brown" etc.
      (3L, "completely different words here today"),
      (50L, "another benchmark document entirely separate"),
      (4L, "another benchmark document entirely distinct")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(docs, "doc_id", col("text"),
      col("doc_id") === 1L || col("doc_id") === 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId.keySet == Set(2L, 4L), s"only overlapping train docs flagged: $got")
    assert(byId(2L)._2 == 3, "doc 2 shares 3 of its 4 shingles with doc 1")
    assert(byId(4L)._3 == 1, "doc 4 overlaps exactly one benchmark doc")
  }

  test("HLL estimate is within 15% of the true distinct count") {
    val n = 5000
    val items = (1 to n).map(i => s"item_$i").toDF("item")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(items, col("item")))
      .head().getDouble(0)
    assert(math.abs(est - n) / n < 0.15, s"b=6 HLL on $n distinct: est=$est")
  }

  test("HLL registers are bounded, merge by max, and ignore duplicates") {
    val items = (1 to 1000).map(i => s"v$i").toDF("item")
    val regs = Sketch.hllRegisters(items, col("item"))
    assert(regs.count() <= 64)
    val doubled = Sketch.hllRegisters(items.unionAll(items), col("item"))
    assert(doubled.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      regs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "cardinality sketch unchanged by duplication")
  }

  test("redactPii replaces emails, IPs and phones with typed placeholders") {
    val df = Seq(
      "write to jane.doe+x@sub.example.org or call +1-555-0199 from 192.168.0.1 ok"
    ).toDF("t")
    val out = df.select(TextOps.redactPii(col("t"))).head().getString(0)
    assert(out == "write to <EMAIL> or call <PHONE> from <IP> ok", out)
    val counts = df.select(TextOps.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((1L, 1L, 1L)))
  }

  test("an IP-shaped host inside an email is swallowed by the email placeholder") {
    // user@10.1.2.3 is not a valid email under our pattern (digit TLD),
    // but name@host.10.1.2.3.example.com IS matched by the email regex
    // first, so no <IP> appears inside <EMAIL>
    val out = Seq("x name@h.10.1.2.3.example.com y")
      .toDF("t").select(TextOps.redactPii(col("t"))).head().getString(0)
    assert(out == "x <EMAIL> y", out)
  }

  test("chunking emits the declared window/stride layout with a ragged tail") {
    val doc = (1 to 95).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val rows = TextOps.chunk(df, "doc_id", col("text"), 50, 10).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    // 95 tokens, window 50, stride 40 -> offsets 0/40/80, sizes 50/50/15
    assert(rows == Seq((0L, 50L), (1L, 50L), (2L, 15L)))
  }

  test("packing keeps offsets inside the capacity and starts each stratum at zero") {
    val p = TextOps.pack(graft.sources.Tables(spark, sf0001).documents,
      "doc_id", "source", col("text"), 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(p.nonEmpty)
    assert(p.forall { case (_, _, bin, off) => bin >= 0 && off >= 0 && off < 256 })
    val firstPerSource = p.groupBy(_._1).values.map(_.minBy(_._2))
    assert(firstPerSource.forall { case (_, _, bin, off) => bin == 0 && off == 0 })
  }

  test("int8 quantization stays in range and within half a quantization step") {
    val q = graft.pipeline.Similarity.quantizeInt8(
      graft.sources.Tables(spark, sf0001).embeddings, "vec_id", "embedding")
    val rows = q.select(col("scale"),
      array_max(transform(col("q"), x => abs(x))).as("mx"),
      expr("array_max(transform(sequence(1, size(v)), " +
        "i -> abs(CAST(element_at(v, i) AS DOUBLE) - element_at(q, i) * scale / 127.0)))")
        .as("err"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 <= 127), "quantized values bounded")
    assert(rows.forall { case (scale, _, err) => err <= scale / 127.0 / 2 + 1e-9 },
      "dequantization error within half a step")
  }

  test("mixSources hits the requested mixture; over-requested sources cap at keep-all") {
    val docs = graft.sources.Tables(spark, sf001).documents
    val weights = Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val budget = 2000L
    val got = TextOps.mixSources(docs, "source", col("text"), weights, budget)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"),
        max(col("__permille")).as("pm"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap

    assert(got.keySet.subsetOf(weights.map(_._1).toSet),
      "unweighted sources must drop entirely")
    // per-source totals (~1300-1500 tokens each): src0 wants 1000 of
    // them (uncapped), src1 600, src2 400 — all partial rates
    weights.foreach { case (s, w) =>
      val (toks, pm) = got(s)
      assert(pm > 0 && pm < 1000, s"$s: expected a partial rate, got $pm")
      val want = budget * w
      assert(toks > want * 0.5 && toks < want * 1.6,
        s"$s: realized $toks tokens vs requested ~$want — hash-gate variance bound blown")
    }
    // over-request: a source asked for more tokens than it has caps at
    // keep-everything and delivers exactly its full token count
    val capped = TextOps.mixSources(docs, "source", col("text"),
        Seq("src3" -> 1.0), budgetTokens = 1000000L)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"),
        max(col("__permille")).as("pm"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val full = docs.filter(col("source") === "src3")
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(capped("src3") == (full, 1000),
      s"over-requested source must keep everything: ${capped("src3")} vs ($full, 1000)")
  }

  test("repetitionFeatures separate repetitive from diverse text") {
    val df = Seq(
      ("a", "spam spam spam spam spam spam spam spam"),
      ("b", "eight entirely distinct words appear in this text")
    ).toDF("id", "t")
    val feats = df.select(
      col("id") +: TextOps.repetitionFeatures(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(feats("a")._1 == 6 && feats("a")._2 == 1, "one distinct shingle of six")
    assert(feats("b")._2 == feats("b")._1, "all shingles distinct")
    assert(feats("a")._3 < 0.2 && feats("b")._3 == 1.0)
  }

  test("ngramCoverage is a position-set union with deterministic top pick") {
    val df = Seq(
      (1L, "a a a b"),        // top 2-gram "a a" x2, covers pos {1,2,3}
      (2L, "a b c"),          // no dup; top "a b" (lex tie-break) covers 2/3
      (3L, "x"),              // shorter than n: no grams at all
      (4L, "a b a b a b")     // "a b" x3 + "b a" x2 overlap-cover everything
    ).toDF("doc_id", "t")
    val got = TextOps.ngramCoverage(df, "doc_id", col("t"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 0.75, 0.75)), s"overlapping 'a a' must union, got ${got(1L)}")
    assert(got(2L) === ((3L, 0.666667, 0.0)), s"lex tie-break + zero dup, got ${got(2L)}")
    assert(got(3L) === ((1L, 0.0, 0.0)), "sub-n docs have zero coverage, not a crash")
    assert(got(4L) === ((6L, 1.0, 1.0)), s"dup union across grams, got ${got(4L)}")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextOps}

class PipelineSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "der hund und die katze und das haus ist ein traum")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val d = Dedup.exactDuplicates(docs, "doc_id", col("text")).collect()
    assert(d.length == 1)
    assert(d.head.getAs[Long]("n") == 2 && d.head.getAs[Long]("keep_id") == 1L)
  }

  test("minhash signature: identical texts identical sigs, near-dups mostly agree") {
    val sigs = docs.select(col("doc_id"), Dedup.minhashSig(col("text"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L), "exact dup -> equal signature")
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree >= 8, s"near-dup should agree on most hashes, got $agree/16")
    val agreeFar = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agreeFar <= 4, s"unrelated docs should rarely agree, got $agreeFar/16")
  }

  test("LSH candidates + verified near-duplicates") {
    val cand = Dedup.lshCandidates(docs, "doc_id", col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 4L)), "exact dup pair is a candidate")
    val near = Dedup.nearDuplicates(docs, "doc_id", col("text"), 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((1L, 4L)))
    assert(near.contains((1L, 2L)) || near.contains((2L, 4L)), "near-dup pair verified")
    assert(!near.exists { case (a, b) => a == 3L || b == 3L }, "unrelated doc not near-dup")
  }

  test("simhash: equal for identical, close for near-dups") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val m = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(4L))
    assert(ham(m(1L), m(2L)) <= 6, s"near-dup hamming ${ham(m(1L), m(2L))}")
  }

  test("ngram jaccard pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", col("text"), 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
  }

  test("cosine topK is ordered and deterministic") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(1f, 0.01f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.topK(emb.filter($"vec_id" =!= 0L), "vec_id", "embedding", Seq(1f, 0f, 0f), 2)
      .collect().map(_.getLong(0)).toList
    assert(top == List(3L, 1L))
  }

  test("lsh bucket assignment is deterministic and query-consistent") {
    val emb = Seq((0L, (0 until 64).map(i => (i % 7).toFloat / 7f)),
      (1L, (0 until 64).map(i => ((i + 3) % 5).toFloat / 5f))).toDF("vec_id", "embedding")
    val b1 = emb.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b")).collect().map(_.getLong(0))
    val b2 = emb.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b")).collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("langId scores lexicons; fingerprint is word-order invariant") {
    val r = docs.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "en" && r(5L) == "de")
    val fps = Seq(("a b c"), ("c b a"), ("a b d")).toDF("text")
      .select(TextOps.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("multimodal: metadata + batched stub decode preserve schema and rows") {
    val media = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = media.select(col("doc_id") +:
      Multimodal.mediaMeta(col("payload")).map { case (n, c) => c.as(n) }: _*)
    assert(meta.count() == 5)
    assert(meta.filter(col("byte_len") <= 0).count() == 0)
    val feats = Multimodal.extractFeatures(spark, media, "doc_id", "payload")
    assert(feats.count() == 5)
    val f = feats.filter(_.id == 1L).head()
    assert(f.byteLen == 43L)
    assert(f.f1 == ('t'.toInt / 255.0))
  }

  test("multimodal resize: uniform byte subsampling matches a driver replay") {
    val media = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH"), // 44 bytes > 32
      (2L, "short")                                          // 5 bytes < 32
    ).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val out = Multimodal.resize(media, "doc_id", col("payload"), outBytes = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def replay(s: String, outB: Int): String = {
      val b = s.getBytes("UTF-8")
      val n = math.min(b.length, outB)
      val sampled = (0 until n).map(i => b((i.toLong * b.length / n).toInt))
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(sampled.map(x => f"${x & 0xff}%02x").mkString.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
    }
    assert(out(1L) === ((44L, 32L, replay("abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH", 32))))
    assert(out(2L) === ((5L, 5L, replay("short", 32)))) // no upsampling
  }

  test("curation composite: each stage drops exactly its own casualties") {
    // 100 = benchmark (id % 50 == 0); 7 too short (quality);
    // 12 exact-dups 11; 13 near-dups 11; 14 shares a shingle with the
    // benchmark; 15 is clean and unique.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (100L, "bench mark text with its own distinct shingle stream here ok"),
      (7L, "too short"),
      (11L, base),
      (12L, base),
      (13L, base.replace("kappa", "lambda")),
      (14L, "bench mark text with completely different unrelated suffix words here"),
      (15L, "a fully clean unique document with enough tokens to survive easily")
    ).toDF("doc_id", "text").withColumn("source", lit("s0"))
    val bench = corpus.filter(col("doc_id") % 50 === 0)
    val rest = corpus.filter(col("doc_id") % 50 =!= 0)
    val q = rest.filter(size(TextOps.tokens(col("text"))) >= 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("text")).orderBy(col("doc_id"))
    val exact = q.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val pairs = Dedup.nearDuplicates(exact, "doc_id", col("text"), 0.7)
    val nd = exact.join(pairs.select(col("db").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    val benchSh = broadcast(bench.select(explode(TextOps.shingles(col("text"), 3)).as("s")).distinct())
    val cont = nd.select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("s"))
      .join(benchSh, Seq("s")).select(col("doc_id")).distinct()
    val clean = nd.join(cont, Seq("doc_id"), "left_anti")
    assert(q.collect().map(_.getLong(0)).toSet === Set(11L, 12L, 13L, 14L, 15L))
    assert(exact.collect().map(_.getLong(0)).toSet === Set(11L, 13L, 14L, 15L))
    assert(nd.collect().map(_.getLong(0)).toSet === Set(11L, 14L, 15L))
    assert(clean.collect().map(_.getLong(0)).toSet === Set(11L, 15L))
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.TextOps
import graft.sources.Tables

/** Text analysis at scan speed over `documents`: token stats, quality
  * features, language-ID scoring, bag-of-words fingerprints.
  */
object TextQueries extends QueryModule {

  override def queries: Seq[QueryDef] = Seq(
    // ---- deterministic hash sampling (curation staple) ----
    // Reproducible across runs/engines and repartitioning (unlike
    // TABLESAMPLE); the md5-derived hash is uniform within any group,
    // so per-source rates stay ~permille without explicit strata.
    QueryDef(
      "q_sample_hash",
      "deterministic 10% hash sample of documents, counted per source",
      (s, dir) =>
        Tables(s, dir).documents
          .filter(TextOps.hashSample(col("text"), 100))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars")),
      Some("""SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE CAST(('0x' || substr(md5('0|' || text), 1, 8)) AS BIGINT) % 1000 < 100
             |GROUP BY source""".stripMargin)
    ),

    // ---- curation composite: quality filter -> dedup -> stats ----
    // The end-to-end shape of a training-data prep job: drop
    // too-short documents, keep the first copy of each exact text,
    // report what survives per source. One window + one aggregate.
    QueryDef(
      "q_pipeline_curate",
      "quality filter (>=5 tokens) + exact keep-first dedup + per-source stats",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("text")).orderBy(col("doc_id"))
        Tables(s, dir).documents
          .filter(size(TextOps.tokens(col("text"))) >= 5)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
      },
      Some("""WITH t AS (SELECT *, len(string_split(text, ' ')) AS n_tokens FROM documents),
             |k AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |      FROM t WHERE n_tokens >= 5)
             |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM k WHERE rn = 1 GROUP BY source""".stripMargin)
    ),

    // ---- count-min sketch: estimates vs truth for top tokens ----
    // The sketch is depth x width rows regardless of corpus size; on
    // this corpus the top tokens' estimates should equal (or bound)
    // the true counts, and both engines build the identical sketch
    // from the md5-seeded hash.
    QueryDef(
      "q_sketch_cms",
      "count-min estimates vs true counts for the 10 most frequent tokens",
      (s, dir) => {
        val toks = Tables(s, dir).documents
          .select(explode(TextOps.tokens(col("text"))).as("token"))
        val sk = graft.pipeline.Sketch.countMin(toks, col("token"))
        val top = toks.groupBy(col("token")).agg(count(lit(1)).as("true_n"))
          .orderBy(col("true_n").desc, col("token")).limit(10)
        val est = graft.pipeline.Sketch.estimate(sk, top.select(col("token")), col("token"))
        top.join(est, col("token") === col("item"))
          .select(col("token"), col("true_n"), col("est"))
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
             |tf AS (SELECT token, count(*) AS true_n FROM toks GROUP BY token),
             |top AS (SELECT token, true_n FROM tf ORDER BY true_n DESC, token LIMIT 10),
             |sk AS (SELECT j,
             |         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || token), 1, 8)) AS BIGINT) % 1024 AS bucket,
             |         count(*) AS n
             |       FROM toks CROSS JOIN (VALUES (0),(1),(2),(3)) AS r(j) GROUP BY 1, 2)
             |SELECT t.token, t.true_n, min(coalesce(sk.n, 0)) AS est
             |FROM top t CROSS JOIN (VALUES (0),(1),(2),(3)) AS r(j)
             |LEFT JOIN sk ON sk.j = r.j AND sk.bucket =
             |  CAST(('0x' || substr(md5(CAST(r.j AS VARCHAR) || '|' || t.token), 1, 8)) AS BIGINT) % 1024
             |GROUP BY 1, 2""".stripMargin)
    ),

    // ---- TF-IDF: top-3 characteristic terms per document ----
    // Smoothed tfidf = tf * ln((N+1)/(df+1)); deterministic top-3 via
    // (score desc, token asc). Two aggregates + one token join — the
    // join key is hash-uniform text, so no skew at corpus scale.
    QueryDef(
      "q_text_tfidf",
      "top-3 TF-IDF terms per document over the corpus",
      (s, dir) => {
        val d = Tables(s, dir).documents
        val n = d.count() // corpus size: one tiny driver-side action
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
        TextOps.tfidf(d, "doc_id", col("text"), n)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"),
            col("rnk").cast("long").as("rnk"))
      },
      Some("""WITH N AS (SELECT count(*) AS n FROM documents),
             |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
             |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
             |scored AS (SELECT doc_id, tf.token AS token, tf, df,
             |                  round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
             |           FROM tf JOIN df ON tf.token = df.token, N),
             |ranked AS (SELECT *, row_number() OVER
             |             (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
             |           FROM scored)
             |SELECT doc_id, token, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
             |FROM ranked WHERE rnk <= 3""".stripMargin)
    ),

    // ---- token counting ----
    QueryDef(
      "q_text_tokens",
      "token and character counts per document",
      (s, dir) =>
        Tables(s, dir).documents.select(
          col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_text")),
      Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             |length(text) AS n_chars_text FROM documents""".stripMargin)
    ),

    // ---- quality features ----
    QueryDef(
      "q_text_quality",
      "quality features: token stats, stopword ratio, mean word length",
      (s, dir) => {
        val cols = TextOps.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }
        Tables(s, dir).documents.select(col("doc_id") +: cols: _*)
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts, length(text) AS lc FROM documents)
             |SELECT doc_id,
             |  len(ts) AS n_tokens,
             |  lc - (len(ts) - 1) AS n_chars_tok,
             |  len(list_filter(ts, x -> x IN ('the','a','of','and','to','in'))) AS n_stopwords,
             |  round((lc - (len(ts) - 1)) * 1.0 / len(ts), 4) AS mean_word_len,
             |  round(len(list_filter(ts, x -> x IN ('the','a','of','and','to','in'))) * 1.0 / len(ts), 4) AS stopword_ratio
             |FROM t""".stripMargin)
    ),

    // ---- language-ID scoring ----
    QueryDef(
      "q_text_langid",
      "stopword-lexicon language ID vs the labeled lang column",
      (s, dir) =>
        Tables(s, dir).documents
          .select(col("lang"), TextOps.langId(col("text")).as("pred"))
          .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n")),
      Some({
        val scores = TextOps.lexicons.map { case (lang, lex) =>
          val inList = lex.map(w => s"'$w'").mkString(",")
          s"len(list_filter(ts, x -> x IN ($inList))) AS s_$lang"
        }.mkString(", ")
        val bestExpr = TextOps.lexicons.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
        // ties: first lexicon in TextOps.lexicons order wins
        val pick = TextOps.lexicons.reverse.foldLeft("'und'") { case (acc, (lang, _)) =>
          s"CASE WHEN s_$lang = best AND best > 0 THEN '$lang' ELSE $acc END"
        }
        s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
           |sc AS (SELECT doc_id, lang, $scores FROM t),
           |sb AS (SELECT *, $bestExpr AS best FROM sc)
           |SELECT lang, $pick AS pred, count(*) AS n FROM sb GROUP BY 1, 2""".stripMargin
      })
    ),

    // ---- corpus n-gram frequency (vocabulary analysis) ----
    QueryDef(
      "q_text_bigrams",
      "top-20 word bigrams corpus-wide, deterministic tie-break",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        docs.select(explode(TextOps.shingles(col("text"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(20)
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |pos AS (SELECT doc_id, ts, unnest(range(1, greatest(len(ts), 2))) AS i FROM tok),
             |bg AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+1], ' ') AS bigram FROM pos)
             |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
             |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin)
    ),

    // ---- document fingerprinting ----
    QueryDef(
      "q_text_fingerprint",
      "bag-of-words md5 fingerprint per document",
      (s, dir) =>
        Tables(s, dir).documents
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
             |md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
             |FROM documents""".stripMargin)
    )
  )
}

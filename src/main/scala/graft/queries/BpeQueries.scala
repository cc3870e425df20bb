package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.BpeTrain
import graft.sources.Tables

/** BPE tokenizer-training gates. The oracle re-derives the ENTIRE
  * training run in SQL — no literals from the Spark run leak in, so
  * the gate proves both engines learn the same merges from the same
  * corpus. Each round is one MATERIALIZED CTE block (the k-core
  * pattern — a round references its predecessor three times, and an
  * inlined plan would re-scan the parquet 3^rounds times):
  * pair counts → deterministic argmax → greedy left-to-right rewrite.
  * The rewrite mirrors [[BpeTrain.applyMerge]]'s fold set-based:
  * match positions, group consecutive runs (a=b runs are the only way
  * matches can be adjacent), keep alternate positions from each run
  * start — exactly the two-pointer greedy scan.
  */
object BpeQueries extends QueryModule {

  /** Gate merge count: deep enough to exercise multi-char merges and
    * the lexicographic tie-break on the sf corpora (rounds 7-8 at
    * sf0.001 tie at cnt and merge a 2-char symbol).
    */
  private val Rounds = 8

  private def model(s: SparkSession, dir: String): BpeTrain.BpeModel =
    SessionPublish.once(s, s"bpetrain|$dir") {
      BpeTrain.train(Tables(s, dir).documents, col("text"), Rounds)
    }

  /** One training round as SQL over `w{r-1}` → `w{r}`. */
  private def roundCte(r: Int): String = {
    val p = s"w${r - 1}"
    s"""pr$r AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs, CAST(sum(cnt) AS BIGINT) AS cnt
       |          FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM $p)
       |          GROUP BY 1, 2),
       |b$r AS (SELECT lhs, rhs, cnt FROM pr$r ORDER BY cnt DESC, lhs, rhs LIMIT 1),
       |mt$r AS MATERIALIZED (SELECT t.word, t.i
       |          FROM (SELECT word, syms, unnest(range(1, len(syms))) AS i FROM $p) t, b$r b
       |          WHERE t.syms[t.i] = b.lhs AND t.syms[t.i+1] = b.rhs),
       |mg$r AS (SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
       |          FROM mt$r),
       |kp$r AS (SELECT word, i FROM (
       |            SELECT word, i, row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
       |            FROM mg$r) WHERE rn % 2 = 1),
       |w$r AS MATERIALIZED (SELECT p.word, min(p.cnt) AS cnt,
       |                list(CASE WHEN k.i IS NOT NULL THEN p.s || p.s2 ELSE p.s END ORDER BY p.p) AS syms
       |         FROM (SELECT word, cnt, p, syms[p] AS s, syms[p+1] AS s2
       |               FROM (SELECT word, cnt, syms, unnest(range(1, len(syms)+1)) AS p FROM $p)) p
       |         LEFT JOIN kp$r k  ON k.word = p.word AND k.i = p.p
       |         LEFT JOIN kp$r k2 ON k2.word = p.word AND k2.i = p.p - 1
       |         WHERE k2.i IS NULL
       |         GROUP BY p.word)""".stripMargin
  }

  /** The shared CTE prefix: initial char-split vocab + all rounds. */
  private def trainCtes: String = {
    val base =
      """WITH w0 AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |         list_transform(range(1, length(word)+1), i -> word[i:i]) AS syms
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE length(word) > 0
        |  GROUP BY word)""".stripMargin
    base + ",\n" + (1 to Rounds).map(roundCte).mkString(",\n")
  }

  override def queries: Seq[QueryDef] = Seq(

    // ---- learned merge table: both engines train from scratch ----
    QueryDef(
      "q_text_bpe_train",
      s"distributed BPE training: $Rounds learned merges (pair argmax per round, deterministic tie-break)",
      (s, dir) => {
        val m = model(s, dir)
        import s.implicits._
        m.merges.map(x => (x.round.toLong, x.lhs, x.rhs, x.cnt))
          .toDF("round", "lhs", "rhs", "cnt")
      },
      Some {
        val union = (1 to Rounds)
          .map(r => s"SELECT CAST($r AS BIGINT) AS round, lhs, rhs, cnt FROM b$r")
          .mkString(" UNION ALL ")
        s"$trainCtes\nSELECT * FROM ($union)"
      }
    ),

    // ---- trained tokenizer applied: per-doc BPE token counts.
    // The corpus tokenizes through ONE broadcast join against the
    // trained word vocab — words tokenize once, documents never
    // re-fold the merges. ----
    QueryDef(
      "q_text_bpe_apply",
      "per-doc token counts under the trained BPE vocab (broadcast vocab join)",
      (s, dir) => {
        val m = model(s, dir)
        BpeTrain.tokenCounts(Tables(s, dir).documents, "doc_id", col("text"), m.vocab)
      },
      Some(
        s"""$trainCtes
           |SELECT d.doc_id, CAST(sum(len(w.syms)) AS BIGINT) AS bpe_tokens
           |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) d
           |JOIN w$Rounds w ON w.word = d.word
           |GROUP BY d.doc_id""".stripMargin)
    ),

    // ---- tokenize-the-corpus: every doc's token stream ----
    // Global positions come from a doc-partitioned running sum of
    // per-word token counts — the oracle mirrors it with the same
    // window over the trained w{R} vocab.
    QueryDef(
      "q_text_bpe_segment",
      "per-doc 1-based BPE token stream under the trained vocab",
      (s, dir) => {
        val m = model(s, dir)
        BpeTrain.segment(Tables(s, dir).documents, "doc_id", col("text"), m.vocab)
      },
      Some(
        s"""$trainCtes,
           |wd AS (SELECT doc_id, ts, unnest(range(1, len(ts)+1)) AS widx
           |       FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
           |seg AS (SELECT wd.doc_id, wd.widx, w.syms,
           |        COALESCE(sum(len(w.syms)) OVER (PARTITION BY wd.doc_id ORDER BY wd.widx
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
           |        FROM wd JOIN w$Rounds w ON w.word = wd.ts[wd.widx]
           |        WHERE length(wd.ts[wd.widx]) > 0)
           |SELECT doc_id, CAST(prev + u.j AS BIGINT) AS pos, syms[u.j] AS token
           |FROM seg, LATERAL unnest(range(1, len(syms)+1)) AS u(j)""".stripMargin)
    ),

    // ---- tokenizer fertility: the compression-ratio quality signal ----
    // BPE tokens per whitespace word (permille): text the tokenizer
    // compresses poorly (gibberish, wrong-script, binary-ish) shows
    // high fertility — the practical post-tokenizer quality filter
    // model teams run besides the perplexity one. Counts are exact
    // integers and the ratio is BIGINT floor division, so the gate is
    // hash-exact; the oracle re-derives segmentation under the SAME
    // replayed 8-round vocab the segment gate pins.
    QueryDef(
      "q_quality_fertility",
      "BPE fertility per doc: segmented tokens per whitespace word (permille)",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val m = model(s, dir)
        val bpe = BpeTrain.segment(docs, "doc_id", col("text"), m.vocab)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("bpe_tokens"))
        docs.select(col("doc_id"),
            size(graft.pipeline.TextOps.tokens(col("text"))).cast("long").as("n_words"))
          .join(bpe, Seq("doc_id"))
          .select(col("doc_id"), col("n_words"), col("bpe_tokens"),
            expr("(1000 * bpe_tokens) DIV n_words").as("fertility_permille"))
      },
      Some(
        s"""$trainCtes,
           |wd AS (SELECT doc_id, ts, unnest(range(1, len(ts)+1)) AS widx
           |       FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
           |j AS (SELECT wd.doc_id, len(w.syms) AS k
           |      FROM wd JOIN w$Rounds w ON w.word = wd.ts[wd.widx]
           |      WHERE length(wd.ts[wd.widx]) > 0),
           |agg AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS bpe_tokens FROM j GROUP BY doc_id),
           |ws AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
           |       FROM documents)
           |SELECT ws.doc_id, ws.n_words, agg.bpe_tokens,
           |       (1000 * agg.bpe_tokens) // ws.n_words AS fertility_permille
           |FROM ws JOIN agg ON ws.doc_id = agg.doc_id""".stripMargin)
    ),

    // ---- incremental training: extend a trained vocab O(batch) ----
    // Base = even docs (8 rounds), extension = odd docs (2 rounds):
    // the extension replays the 8 published merges over the odd vocab
    // only (no argmax, base corpus untouched), folds counts, and
    // learns rounds 9-10 over the union. The oracle re-derives ALL of
    // it — base training, replay (same rewrite blocks driven by the
    // base round's pair instead of a fresh argmax), count fold, and
    // the union rounds — so both engines agree on the full 10-row
    // history, including round 9's merge ON an earlier learned symbol.
    QueryDef(
      "q_text_bpe_incremental",
      "BPE vocab extension: 8 base merges (evens) + 2 union merges (odds folded in)",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val base = SessionPublish.once(s, s"bpebase|$dir") {
          BpeTrain.train(docs.filter(col("doc_id") % 2 === 0), col("text"), Rounds)
        }
        val full = BpeTrain.extend(base, docs.filter(col("doc_id") % 2 === 1),
          col("text"), extraRounds = 2)
        import s.implicits._
        full.merges.map(x => (x.round.toLong, x.lhs, x.rhs, x.cnt))
          .toDF("round", "lhs", "rhs", "cnt")
      },
      Some {
        val parts = Seq(vocab0Sql("we", "doc_id % 2 = 0")) ++
          (1 to Rounds).map(r => roundSql(r, "we", argmax = true)) ++
          Seq(vocab0Sql("od", "doc_id % 2 = 1")) ++
          (1 to Rounds).map(r => roundSql(r, "od", argmax = false, pairFrom = s"bwe$r")) ++
          Seq(s"""un0 AS MATERIALIZED (SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt, min(syms) AS syms
                 |  FROM (SELECT * FROM we$Rounds UNION ALL SELECT * FROM od$Rounds)
                 |  GROUP BY word)""".stripMargin) ++
          (1 to 2).map(r => roundSql(r, "un", argmax = true))
        val union = ((1 to Rounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, lhs, rhs, cnt FROM bwe$r") ++
          (1 to 2).map(r =>
            s"SELECT CAST(${Rounds + r} AS BIGINT), lhs, rhs, cnt FROM bun$r"))
          .mkString(" UNION ALL ")
        "WITH " + parts.mkString(",\n") + s"\nSELECT * FROM ($union)"
      }
    )
  )

  /** Char-split word vocab of a corpus slice, as CTE `{pfx}0`. */
  private def vocab0Sql(pfx: String, where: String): String =
    s"""${pfx}0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
       |         list_transform(range(1, length(word)+1), i -> word[i:i]) AS syms
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents WHERE $where)
       |  WHERE length(word) > 0 GROUP BY word)""".stripMargin

  /** One round over `{pfx}{r-1}` → `{pfx}{r}`. With `argmax` the pair
    * is this vocab's own most-frequent (CTE `b{pfx}{r}`); otherwise
    * the rewrite REPLAYS the pair of `pairFrom` — the published-merge
    * replay of the incremental leg.
    */
  private def roundSql(r: Int, pfx: String, argmax: Boolean,
      pairFrom: String = ""): String = {
    val p = s"$pfx${r - 1}"
    val b = if (argmax) s"b$pfx$r" else pairFrom
    val own = if (!argmax) "" else
      s"""pr$pfx$r AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs, CAST(sum(cnt) AS BIGINT) AS cnt
         |          FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM $p)
         |          GROUP BY 1, 2),
         |b$pfx$r AS (SELECT lhs, rhs, cnt FROM pr$pfx$r ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |""".stripMargin
    s"""${own}mt$pfx$r AS MATERIALIZED (SELECT t.word, t.i
       |          FROM (SELECT word, syms, unnest(range(1, len(syms))) AS i FROM $p) t, $b bb
       |          WHERE t.syms[t.i] = bb.lhs AND t.syms[t.i+1] = bb.rhs),
       |mg$pfx$r AS (SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
       |          FROM mt$pfx$r),
       |kp$pfx$r AS (SELECT word, i FROM (
       |            SELECT word, i, row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
       |            FROM mg$pfx$r) WHERE rn % 2 = 1),
       |$pfx$r AS MATERIALIZED (SELECT p.word, min(p.cnt) AS cnt,
       |                list(CASE WHEN k.i IS NOT NULL THEN p.s || p.s2 ELSE p.s END ORDER BY p.p) AS syms
       |         FROM (SELECT word, cnt, p, syms[p] AS s, syms[p+1] AS s2
       |               FROM (SELECT word, cnt, syms, unnest(range(1, len(syms)+1)) AS p FROM $p)) p
       |         LEFT JOIN kp$pfx$r k  ON k.word = p.word AND k.i = p.p
       |         LEFT JOIN kp$pfx$r k2 ON k2.word = p.word AND k2.i = p.p - 1
       |         WHERE k2.i IS NULL
       |         GROUP BY p.word)""".stripMargin
  }
}

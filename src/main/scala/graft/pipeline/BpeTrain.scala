package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al., ACL'16 —
  * public knowledge) — learns a merge table from the corpus, the
  * missing half of the engine's tokenization story ([[TextOps.bpeTokenRe]]
  * only counts tokens of a vocabulary-free approximation).
  *
  * Word-level BPE: the corpus collapses to its WORD VOCABULARY first
  * (one groupBy — at 100 TB the vocab is millions-to-billions of rows
  * where the corpus is trillions of tokens, and every later round is
  * vocab-bounded, never corpus-bounded). Each round then
  *
  *  1. counts adjacent symbol pairs weighted by word frequency
  *     (one vocab-bounded groupBy with map-side combine; overlapping
  *     occurrences all count, matching the reference algorithm),
  *  2. picks the most frequent pair — ties broken (count desc, lhs
  *     asc, rhs asc) so training is DETERMINISTIC across engines and
  *     cluster layouts; the argmax is `orderBy.limit(1)` which plans
  *     as TakeOrdered, never a single-partition sort,
  *  3. rewrites every word's symbol sequence by the greedy
  *     left-to-right merge — a pure codegen'd `aggregate` fold
  *     ([[applyMerge]]), no shuffle, no UDF.
  *
  * Per-round `localCheckpoint` keeps the plan flat across rounds
  * (the k-core idiom — lineage would otherwise stack one fold per
  * round). The learned merge table is `rounds` rows on the driver;
  * the trained vocabulary stays distributed.
  *
  * Reference anchor: HGraphStorage models typed property VALUES, not
  * tokenizers (`HGraphStorage/src/Database/Graph/HGraphStorage/Types.hs`);
  * BPE training is part of the beyond-reference training-data surface
  * the engine targets.
  */
object BpeTrain {

  /** One learned merge: at `round`, symbol pair (`lhs`,`rhs`) —
    * weighted occurrence count `cnt` — became the token `lhs+rhs`.
    */
  final case class BpeMerge(round: Int, lhs: String, rhs: String, cnt: Long)

  /** A trained tokenizer: the ordered merge table plus the tokenized
    * word vocabulary `(word, cnt, syms)` it produced.
    */
  final case class BpeModel(merges: Seq[BpeMerge], vocab: DataFrame)

  /** Character split of a word — `substr` per position, so Spark and
    * the SQL oracle agree on char (not byte) indexing.
    */
  def chars(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Word vocabulary of a corpus: `(word, cnt, syms)` with syms the
    * initial character sequence. One corpus-wide groupBy — the only
    * corpus-bounded step in training.
    */
  def wordVocab(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextOps.tokens(text)).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", chars(col("word")))

  /** Adjacent-pair counts over a `(word, cnt, syms)` vocab, weighted
    * by word frequency; overlapping occurrences all count ("aaa"
    * contributes (a,a) twice), matching the reference get_stats.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.where(size(col("syms")) >= 2)
      .select(col("cnt"), col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
      .select(col("cnt"),
        element_at(col("syms"), col("i")).as("lhs"),
        element_at(col("syms"), col("i") + 1).as("rhs"))
      .groupBy("lhs", "rhs").agg(sum("cnt").as("cnt"))

  /** Greedy left-to-right merge of the pair (`lhs`,`rhs`) in a symbol
    * sequence, as one codegen'd fold: append each symbol unless the
    * accumulated tail is `lhs` and the symbol is `rhs`, in which case
    * the tail becomes the merged token. Equivalence to the two-pointer
    * scan holds because a just-merged tail equals `lhs+rhs`, which can
    * never equal `lhs` (rhs is nonempty) — so a merged token is never
    * merged again by the same rule ("aaaa" + (a,a) → aa,aa not aaa,a).
    * The nested `when` keeps `element_at` off empty arrays (ANSI).
    */
  def applyMerge(syms: Column, lhs: String, rhs: String): Column = {
    val merged = lhs + rhs
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) === 0, array(s))
          .otherwise(
            when(element_at(acc, size(acc)) === lit(lhs) && s === lit(rhs),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
              .otherwise(concat(acc, array(s)))))
  }

  /** Apply an ordered merge table (round order) — chained folds. */
  def applyMerges(syms: Column, merges: Seq[BpeMerge]): Column =
    merges.sortBy(_.round).foldLeft(syms)((c, m) => applyMerge(c, m.lhs, m.rhs))

  /** Train `rounds` merges. Stops early if the vocabulary runs out of
    * pairs (every word fully merged). Each round materializes the
    * rewritten vocab via `localCheckpoint` (lineage stays one fold
    * deep; the vocab is the training set's word count, never the
    * corpus).
    */
  def train(docs: DataFrame, text: Column, rounds: Int): BpeModel = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    trainRounds(wordVocab(docs, text).localCheckpoint(), firstRound = 1, rounds)
  }

  private def trainRounds(vocab: DataFrame, firstRound: Int, rounds: Int): BpeModel = {
    var words = vocab
    val merges = Seq.newBuilder[BpeMerge]
    var r = firstRound
    var exhausted = false
    while (r < firstRound + rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Row(l: String, rh: String, c: Long) = top(0)
        merges += BpeMerge(r, l, rh, c)
        words = words.withColumn("syms", applyMerge(col("syms"), l, rh))
          .localCheckpoint()
        r += 1
      }
    }
    BpeModel(merges.result(), words)
  }

  /** Extend a trained tokenizer with a NEW corpus — the O(batch)
    * incremental leg: the new corpus collapses to ITS word vocab,
    * replays the published merges (per-word folds, no argmax — the
    * base corpus is never re-read, let alone re-counted), folds into
    * the published vocab by summing counts (identical words have
    * identical syms under the same merge table, by determinism of
    * the greedy fold — spec-pinned), and training continues for
    * `extraRounds` over the union. Rounds keep numbering where the
    * base left off, so the returned model's merge table is the full
    * ordered history.
    */
  def extend(model: BpeModel, newDocs: DataFrame, text: Column,
      extraRounds: Int): BpeModel = {
    require(extraRounds >= 1, s"extraRounds must be >= 1, got $extraRounds")
    val replayed = wordVocab(newDocs, text)
      .withColumn("syms", applyMerges(chars(col("word")), model.merges))
    val union = model.vocab.select(col("word"), col("cnt"), col("syms"))
      .unionByName(replayed.select(col("word"), col("cnt"), col("syms")))
      .groupBy(col("word"))
      .agg(sum(col("cnt")).as("cnt"), min(col("syms")).as("syms"))
      .localCheckpoint()
    val ext = trainRounds(union, firstRound = model.merges.size + 1, extraRounds)
    BpeModel(model.merges ++ ext.merges, ext.vocab)
  }

  /** Per-document token counts under a trained vocab: explode the
    * document's words, broadcast-join the tokenized vocabulary, sum
    * `size(syms)`. The corpus is scanned once and never shuffled on
    * anything but the final per-doc sum; the vocab rides the
    * broadcast side (at extreme vocab sizes drop the hint and let
    * AQE pick a shuffle join — counts stay identical).
    */
  def tokenCounts(docs: DataFrame, idCol: String, text: Column,
      vocab: DataFrame): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(text)).as("word"))
      .where(length(col("word")) > 0)
      .join(broadcast(vocab.select(col("word"), size(col("syms")).as("n_syms"))),
        Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_syms")).cast("long").as("bpe_tokens"))

  /** The tokenize-the-corpus step: each document's 1-based token
    * stream `(idCol, pos, token)` under a trained vocab. Same
    * broadcast-vocab shape as [[tokenCounts]] — words never re-fold
    * the merges — plus one DOC-partitioned running sum to convert
    * per-word offsets into global positions (no global window, so
    * the plan parallelizes by document at any corpus size).
    */
  def segment(docs: DataFrame, idCol: String, text: Column,
      vocab: DataFrame): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(TextOps.tokens(text)).as(Seq("widx", "word")))
      .where(length(col("word")) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("widx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    words
      .join(broadcast(vocab.select(col("word"), col("syms"))), Seq("word"))
      .withColumn("prev", coalesce(sum(size(col("syms"))).over(w), lit(0)))
      .select(col(idCol), col("prev"), posexplode(col("syms")).as(Seq("j", "token")))
      .select(col(idCol), (col("prev") + col("j") + 1).cast("long").as("pos"),
        col("token"))
  }
}

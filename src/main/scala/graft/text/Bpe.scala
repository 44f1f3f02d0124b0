package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Byte-pair-encoding merge induction (Sennrich et al., ACL 2016) — the
  * vocabulary-learning step of every modern tokenizer, run as a fixed
  * number of relational rounds over the corpus's WORD table.
  *
  * Per round: count adjacent symbol pairs weighted by word frequency,
  * pick the global argmax (ties → lexicographically smallest pair, so
  * the choice is total-ordered), merge that pair greedily left-to-right
  * in every word, repeat. All counting is integer and the merge scan is
  * a deterministic fold, so the learned merge table is bit-identical on
  * any engine — `q_bpe_merges` gates 3 rounds against a DuckDB oracle
  * whose merge step is a recursive CTE walking the same positions.
  *
  * Scale shape: everything after tokenization operates on the DISTINCT
  * vocabulary (Heaps'-law sublinear in corpus size, ~10⁵–10⁶ rows at
  * 100 TB — the standard BPE-training trick, word counts once, symbols
  * per distinct word). Pair counting is an explode + partial-agg'd
  * (a, b)-keyed shuffle over short per-word pair lists; the argmax is a
  * 1-row `TakeOrderedAndProject` broadcast back into the merge
  * projection — the driver never holds anything corpus-sized. The
  * left-to-right merge fold is per-word O(len) with lookahead carried in
  * the fold state (a `skip` flag), exactly the sequential semantics of
  * reference BPE.
  */
object Bpe {

  /** Split a word into 1-character symbols (character BPE). Shared with
    * [[WordPiece]] so the tokenizer trio can never disagree on the base
    * alphabet.
    */
  private[text] def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))

  /** Distinct-word table (__w, __wcnt) under the shared normalization —
    * the frame every tokenizer trains over. Shared with [[WordPiece]]
    * (UnigramLm.wordTable is the public-API variant with unprefixed
    * column names) so a normalization change cannot silently diverge
    * the trio.
    */
  private[text] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__wcnt"))

  /** Split a word into its UTF-8 BYTES, each rendered as a 2-hex-digit
    * base symbol ("48", "c3", …) — the byte-level alphabet (GPT-2 /
    * SentencePiece byte-fallback stance). Exactly 256 base symbols exist
    * and EVERY string decomposes into them, so byte-level BPE can never
    * emit UNK: an unseen word simply falls back to (partially-merged)
    * byte symbols. Hex pairs rather than GPT-2's printable-unicode remap
    * because they replay byte-exactly in any engine (`hex()` is the same
    * function in DuckDB) — the remap is a bijection, so merges learned
    * over either rendering are isomorphic.
    */
  private def byteSyms(w: Column): Column = {
    val h = lower(hex(encode(w, "UTF-8")))
    transform(sequence(lit(1), (length(h) / 2).cast("int")),
      i => h.substr(i * 2 - 1, lit(2)))
  }

  private def substring(c: Column, pos: Column, len: Column): Column =
    c.substr(pos, len)

  /** Greedy left-to-right application of merge (a, b) → ab to a symbol
    * array: a fold whose state is (skip-next flag, output) — the skip
    * flag is what makes "aaa" merge ONCE under (a,a), like reference BPE.
    */
  def applyMerge(s: Column, a: Column, b: Column): Column = {
    val nexts = concat(slice(s, lit(2), greatest(size(s) - 1, lit(0))),
      array(lit(null).cast("string")))
    val zipped = zip_with(s, nexts, (x, y) =>
      struct(x.as("cur"), y.as("nxt")))
    aggregate(zipped,
      struct(lit(false).as("skip"), array().cast("array<string>").as("out")),
      (acc, p) => {
        val skip = acc.getField("skip")
        val out = acc.getField("out")
        when(skip, struct(lit(false).as("skip"), out.as("out")))
          .when(p.getField("cur") === a && p.getField("nxt") === b,
            struct(lit(true).as("skip"),
              concat(out, array(concat(a, b))).as("out")))
          .otherwise(struct(lit(false).as("skip"),
            concat(out, array(p.getField("cur"))).as("out")))
      },
      acc => acc.getField("out"))
  }

  /** The shared training loop: per-round top-pair frames plus the final
    * symbol table (one row per distinct word, `rounds` merges applied).
    */
  private def run(docs: DataFrame, textCol: String, rounds: Int,
      init: Column => Column = chars): (Seq[DataFrame], DataFrame) = {
    require(rounds >= 1, "need at least one round")
    val vocab = wordTable(docs, textCol)

    // Lazily checkpointed per round (the WordPiece.run rationale): every
    // round's argmax frame and the final symbol table re-evaluate the
    // chain, so without truncation the corpus explode+groupBy behind
    // wordTable re-runs O(rounds²) times; the table is
    // distinct-word-sized, so block storage beats the recompute.
    var symbols = vocab.select(col("__w"), col("__wcnt"),
      init(col("__w")).as("__s"))
      .localCheckpoint(false)
    val merges = (1 to rounds).map { r =>
      val pairs = symbols
        .select(col("__wcnt"),
          explode(zip_with(col("__s"),
            concat(slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
              array(lit(null).cast("string"))),
            (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
        .filter(col("__p.b").isNotNull)
        .groupBy(col("__p.a").as("left"), col("__p.b").as("right"))
        .agg(sum(col("__wcnt")).as("pair_count"))
      val top = pairs
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(1)
      // LEFT join, not crossJoin: a round with no remaining pairs (every
      // word already one symbol) yields an EMPTY argmax, and a cross
      // join with an empty frame would annihilate the symbol table —
      // silently collapsing the learned vocabulary to the bare alphabet
      // for every later consumer. With no merge the round is a no-op.
      symbols = symbols.join(broadcast(
          top.select(col("left").as("__ma"), col("right").as("__mb"))),
          lit(true), "left")
        .select(col("__w"), col("__wcnt"),
          when(col("__ma").isNotNull,
            applyMerge(col("__s"), col("__ma"), col("__mb")))
            .otherwise(col("__s")).as("__s"))
        .localCheckpoint(false)
      top.select(lit(r).as("round"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
    }
    (merges, symbols)
  }

  /** Learn `rounds` merges. @return (round, left, right, merged,
    * pair_count) — one row per learned merge, `round` starting at 1.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    run(docs, textCol, rounds)._1.reduce(_ unionByName _)

  /** Byte-level merge induction: same loop, same argmax, same greedy
    * fold, but over the [[byteSyms]] alphabet — so ANY UTF-8 input
    * tokenizes with zero UNK (unseen words degrade to byte symbols, the
    * byte-fallback guarantee character BPE lacks). Merged symbols are
    * hex-pair concatenations ("7468" = "th"); decode is hex → bytes.
    */
  def learnMergesBytes(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame =
    run(docs, textCol, rounds, byteSyms)._1.reduce(_ unionByName _)

  /** Apply side for the byte-level vocabulary: per-doc token counts via
    * the distinct-word join, PLUS the fallback accounting — every word
    * tokenizes (n_words counts all of them), so the only question a
    * byte-level tokenizer leaves is how MERGED its output is.
    * @return (doc_id, n_words, n_tokens, n_bytes) — n_tokens = n_bytes
    *         would mean no merge ever fired.
    */
  def tokenCountsBytes(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val vocabSyms = run(docs, textCol, rounds, byteSyms)._2
      .select(col("__w"), size(col("__s")).as("__ntok"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .join(vocabSyms, "__w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"),
        sum(length(encode(col("__w"), "UTF-8")).cast("long")).as("n_bytes"))
  }

  /** Corpus symbol frequencies AFTER `rounds` merges — the vocabulary
    * report a tokenizer trainer emits (how much of the corpus each
    * learned symbol covers). Same relational shape: one explode over the
    * distinct-word symbol table, weighted by word count.
    */
  def symbolFrequencies(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame =
    run(docs, textCol, rounds)._2
      .select(col("__wcnt"), explode(col("__s")).as("symbol"))
      .groupBy("symbol").agg(sum(col("__wcnt")).as("total_count"))

  /** Per-document BPE token counts — the APPLY side: documents are never
    * re-segmented; each doc's words join the already-merged VOCABULARY
    * symbol table (the standard tokenizer trick: segment each distinct
    * word once, look it up everywhere). One word-keyed join — the
    * vocabulary is corpus-derived, so it is joined, not broadcast — and
    * a partial-agg'd per-doc sum of `size(symbols)`.
    *
    * @return (doc_id, n_words, n_tokens) — chars-per-token compression
    *         is the tokenizer-quality metric readers derive from this
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val vocabSyms = run(docs, textCol, rounds)._2
      .select(col("__w"), size(col("__s")).as("__ntok"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .join(vocabSyms, "__w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"))
  }

  /** Per-group tokenizer FERTILITY — tokens/word and chars/token, THE
    * tokenizer-quality readout (a language whose fertility is 2× pays 2×
    * the sequence length for the same text; the cross-lingual-equity
    * number every multilingual-tokenizer paper reports). Same apply-side
    * shape as [[tokenCounts]] (distinct words join the merged
    * vocabulary), aggregated per `groupCol` with exact integer totals
    * and two end divisions.
    */
  def fertility(docs: DataFrame, groupCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val vocabSyms = run(docs, textCol, rounds)._2
      .select(col("__w"), size(col("__s")).as("__ntok"))
    docs
      .select(col(groupCol).as("__grp"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .join(vocabSyms, "__w")
      .groupBy("__grp")
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"),
        sum(length(col("__w")).cast("long")).as("n_chars"))
      .select(col("__grp").as(groupCol), col("n_words"), col("n_tokens"),
        col("n_chars"),
        round(col("n_tokens").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_tokens"), 6)
          .as("chars_per_token"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** WordPiece vocabulary induction and tokenization (Schuster & Nakajima,
  * ICASSP 2012 — the BERT tokenizer), completing the tokenizer trio next
  * to [[Bpe]] (frequency-argmax merges) and [[UnigramLm]] (prune-down
  * EM): WordPiece merges the pair maximizing the LIKELIHOOD gain
  * `count(ab) / (count(a) · count(b))` — frequent-together relative to
  * frequent-apart — and tokenizes by greedy LONGEST-MATCH against the
  * final vocabulary, not by replaying merges.
  *
  * Scale shape: identical to [[Bpe]]'s — everything after word counting
  * operates on the DISTINCT vocabulary; per round one extra symbol-count
  * aggregate joins the pair counts (both partial-agg'd keyed shuffles).
  * The score divides exact BIGINTs in float64 (`c / (c_a·c_b)` with the
  * product exact well past any corpus size that fits a long), so the
  * (score DESC, pair ASC) argmax is engine-exact.
  *
  * The apply side precomputes a LONGEST-MATCH table (word-position ×
  * vocabulary equi-join + per-position max) and then walks it — the walk
  * advances ≥1 char per step, so `cap` rounds bound it, and every step
  * is a (word, position)-keyed join against the (checkpointed,
  * model-sized) match table. No driver-side model literals: the
  * vocabulary stays a table, which is what survives a 30k-piece
  * production vocab.
  */
object WordPiece {

  /** The shared training loop: per-round argmax frames + final symbols.
    * Word table and base alphabet come from [[Bpe]]'s shared helpers so
    * the tokenizer trio can never diverge on normalization.
    */
  private def run(docs: DataFrame, textCol: String,
      rounds: Int): (Seq[DataFrame], DataFrame) = {
    require(rounds >= 1, "need at least one round")
    // Lazily checkpointed per round: each round reads `symbols` TWICE
    // (symbol counts + pair counts) and every round's argmax frame
    // re-evaluates the chain, so without truncation the corpus
    // explode+groupBy behind wordTable re-runs O(rounds²) times. The
    // table is distinct-word-sized — block storage is far cheaper than
    // the recompute here (measured 2.5 s → 1.1 s at sf0.1, rounds=3;
    // contrast the PageRank negative result in BASELINE.md, where the
    // per-round state was edge-sized and recompute won).
    var symbols = Bpe.wordTable(docs, textCol)
      .select(col("__w"), col("__wcnt"), Bpe.chars(col("__w")).as("__s"))
      .localCheckpoint(false)
    val merges = (1 to rounds).map { r =>
      val symCounts = symbols
        .select(col("__wcnt"), explode(col("__s")).as("__sym"))
        .groupBy("__sym").agg(sum(col("__wcnt")).as("__sc"))
      val pairs = symbols
        .select(col("__wcnt"),
          explode(zip_with(col("__s"),
            concat(slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
              array(lit(null).cast("string"))),
            (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
        .filter(col("__p.b").isNotNull)
        .groupBy(col("__p.a").as("left"), col("__p.b").as("right"))
        .agg(sum(col("__wcnt")).as("pair_count"))
      val scored = pairs
        .join(symCounts.select(col("__sym").as("left"),
          col("__sc").as("left_count")), "left")
        .join(symCounts.select(col("__sym").as("right"),
          col("__sc").as("right_count")), "right")
        .withColumn("__score", col("pair_count").cast("double") /
          (col("left_count") * col("right_count")).cast("double"))
      val top = scored
        .orderBy(col("__score").desc, col("left").asc, col("right").asc)
        .limit(1)
      // LEFT join, not crossJoin — an empty argmax (no pairs left) must
      // make the round a no-op, not annihilate the table (see Bpe.run).
      symbols = symbols.join(broadcast(
          top.select(col("left").as("__ma"), col("right").as("__mb"))),
          lit(true), "left")
        .select(col("__w"), col("__wcnt"),
          when(col("__ma").isNotNull,
            Bpe.applyMerge(col("__s"), col("__ma"), col("__mb")))
            .otherwise(col("__s")).as("__s"))
        .localCheckpoint(false)
      top.select(lit(r).as("round"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"),
        col("pair_count"), col("left_count"), col("right_count"))
    }
    (merges, symbols)
  }

  /** Learn `rounds` likelihood-argmax merges.
    * @return (round, left, right, merged, pair_count, left_count,
    *         right_count) — all-integer evidence; score =
    *         pair_count / (left_count·right_count) is derivable.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    run(docs, textCol, rounds)._1.reduce(_ unionByName _)

  /** Greedy longest-match token counts per document over the vocabulary
    * learned in `rounds` merges (= every symbol surviving in the merged
    * segmentation, single corpus characters included — so any in-corpus
    * word tokenizes). Words longer than `cap` chars are out of model,
    * mirroring [[UnigramLm]]'s cap so the DuckDB oracle can bound its
    * recursion.
    *
    * @return (doc_id, n_words, n_tokens) over words of length ≤ cap
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, cap: Int = 12): DataFrame = {
    // The merged symbol table IS the word table (one row per distinct
    // word) — derive vocabulary, alphabet, and the word list from it and
    // truncate once, so training runs a single time instead of once per
    // consumer and the corpus is never re-tokenized for a second word
    // table.
    val syms = run(docs, textCol, rounds)._2.localCheckpoint(false)
    // Vocabulary = surviving merged symbols ∪ the BASE ALPHABET (every
    // single corpus character). The alphabet matters: a character merged
    // into a larger symbol at every s3 occurrence would otherwise be
    // absent, and a longest-match walk that lands off that word's own
    // segmentation boundaries could strand mid-word with no matching
    // piece — alphabet fallback guarantees ≥1-char progress everywhere.
    val vocabPieces = syms
      .select(explode(col("__s")).as("__piece"))
      .unionByName(syms.select(
        explode(Bpe.chars(col("__w"))).as("__piece")))
      .distinct()
    val words = syms
      .filter(length(col("__w")) <= cap)
      .select(col("__w"))
    // Longest match per (word, position): candidate substrings at every
    // position for every POSSIBLE piece length — analytically bounded
    // (each merge at most doubles a symbol, so ≤ 2^rounds, and never
    // past the cap), which keeps this a pure equi-join with no
    // driver-side probe of the vocabulary. Never the |words| × |vocab|
    // theta-join a substring-match predicate would plan. Single corpus
    // chars are always in the vocabulary, so every position matches (no
    // UNK within the corpus).
    // 1L shift with a clamp: `1 << rounds` is an Int shift (mod 32), so
    // rounds >= 31 would wrap to a negative/tiny bound and silently
    // empty or cripple the match table. Past 2^rounds >= cap the cap is
    // the binding bound anyway.
    val maxPiece =
      if (rounds >= 31) cap
      else math.min(1L << rounds, cap.toLong).toInt
    val lens = (1 to maxPiece).toArray
    val lm = words
      .select(col("__w"),
        explode(sequence(lit(1), length(col("__w")))).as("__i"))
      .select(col("__w"), col("__i"),
        explode(array(lens.map(lit(_)): _*)).as("__k"))
      .withColumn("__key", col("__w").substr(col("__i"), col("__k")))
      .filter(length(col("__key")) === col("__k")) // no running past the end
      .join(vocabPieces.withColumnRenamed("__piece", "__key"), "__key")
      .groupBy(col("__w"), col("__i"))
      .agg(max(col("__k")).as("__k"))
    // The walk is WORD-LOCAL (the pointer chase never leaves a word), so
    // it needs no iterative joins at all: gather each word's per-position
    // jump lengths into a map, then one higher-order fold walks positions
    // 1..len carrying (cursor, count) — positions the cursor already
    // jumped over fall through. One keyed aggregate + one map pass,
    // versus cap join rounds.
    val perWord = lm
      .groupBy(col("__w"))
      .agg(map_from_entries(collect_list(struct(col("__i"), col("__k"))))
        .as("__jump"))
      .select(col("__w"),
        aggregate(sequence(lit(1), length(col("__w"))),
          struct(lit(1).as("i"), lit(0L).as("ntok")),
          (acc, p) => when(p === acc.getField("i"),
            struct((acc.getField("i") + element_at(col("__jump"), p)).as("i"),
              (acc.getField("ntok") + 1).as("ntok")))
            .otherwise(acc),
          acc => acc.getField("ntok")).as("__ntok"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "" && length(col("__w")) <= cap)
      .join(perWord, "__w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"))
  }
}

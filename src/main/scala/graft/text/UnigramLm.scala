package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Unigram language-model tokenizer induction (Kudo, ACL 2018 — the
  * SentencePiece `unigram` algorithm), hard-EM variant, over the corpus's
  * distinct-word table.
  *
  * Training: seed a candidate vocabulary with the corpus's most frequent
  * substrings (plus every single character, which keeps every word
  * segmentable), then alternate (E) Viterbi-segment each distinct word
  * under the current piece scores and count piece usage weighted by word
  * frequency, (M) re-score pieces from the counts and prune to the target
  * vocabulary size, keeping the highest-usage multi-character pieces.
  * Hard EM (Viterbi counts, not forward–backward expectations) keeps the
  * usage counts INTEGER, so model state is engine- and partition-exact;
  * the only floats are the broadcast log-scores, identical doubles
  * everywhere, and the per-word DP breaks score ties deterministically
  * (prefer the longer final piece).
  *
  * Scale shape (the same discipline as [[Bpe]]): every training pass runs
  * over the DISTINCT word table — Heaps'-law sublinear in corpus size —
  * never the corpus; piece counting is a map-side Viterbi (broadcast
  * vocabulary, model-sized) followed by one piece-keyed partial-agg'd
  * shuffle; only vocabulary-sized frames (≤ `seedSize` rows) are ever
  * collected. The apply side segments each distinct word once and joins
  * token counts back to documents by word.
  */
object UnigramLm {

  /** Piece scores are derived from integer usage counts: add-one smoothing
    * keeps never-chosen single characters usable (score floor, no −∞).
    */
  case class Model(counts: Map[String, Long], maxPieceLen: Int) {
    def logScores: Map[String, Double] = {
      val total = counts.valuesIterator.map(_ + 1L).sum.toDouble
      counts.map { case (p, c) => p -> math.log((c + 1L) / total) }
    }
  }

  /** (word, count) over the normalized corpus — the shared front door. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(Dedup.normalizeText(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wcnt"))

  /** Substring-seed enumeration considers start positions 1..64 only —
    * a fixed bound shared with the SQL oracles (which unroll it as
    * `range(1, 65)`), so pathological >64-char "words" contribute the
    * same piece set on both sides. SentencePiece applies the same kind
    * of length cap during seeding.
    */
  val SeedStartCap = 64

  /** Candidate seed: every substring of length 1..maxPieceLen, weighted by
    * word count; all single characters survive unconditionally, the best
    * `seedSize` longer substrings by (count desc, piece asc) join them.
    */
  def seedCounts(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): Map[String, Long] = {
    // Per start index, keep only FULL-length substrings (substr past the
    // word end truncates, which would double-count the tail otherwise).
    val subs = words
      .select(col("wcnt"), explode(flatten(transform(
        sequence(lit(1), least(length(col("word")), lit(SeedStartCap))),
        i => filter(
          transform(sequence(lit(1), lit(maxPieceLen)),
            l => col("word").substr(i, l)),
          (p, idx) => length(p) === idx + 1)))).as("piece"))
      .groupBy("piece").agg(sum(col("wcnt")).as("pcnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("pcnt").desc, col("piece").asc)
      .limit(seedSize)
    chars.unionByName(multi).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Deterministic Viterbi segmentation of `w` under `scores`: maximize
    * summed piece score; ties prefer the longer final piece. Unknown
    * characters fall back to a flat-penalty single-char piece, so every
    * input segments.
    */
  private[text] def viterbi(w: String, scores: Map[String, Double],
      maxPieceLen: Int): List[String] = {
    val n = w.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // start index of the piece ending at i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          // Single-CODE-POINT fallback for characters outside the
          // vocabulary keeps ANY input segmentable (unknown chars cost a
          // flat penalty far below any real piece score — deterministic,
          // no -inf dead ends). i/j are UTF-16 indices, so one code point
          // spans 1 unit or 2 (a surrogate pair) — never split a pair.
          val oneCp = i - j == 1 ||
            (i - j == 2 && Character.isHighSurrogate(w.charAt(j)) &&
              Character.isLowSurrogate(w.charAt(j + 1)))
          val sOpt = scores.get(w.substring(j, i))
            .orElse(if (oneCp) Some(-100.0) else None)
          sOpt match {
            case Some(s) =>
              val cand = best(j) + s
              // Ties prefer the longer final piece (smaller j).
              if (cand > best(i) || (cand == best(i) && j < back(i))) {
                best(i) = cand
                back(i) = j
              }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var end = n
    while (end > 0) {
      val start = back(end)
      out = w.substring(start, end) :: out
      end = start
    }
    out
  }

  /** Best-segmentation log score of `w` — the DP VALUE viterbi maximizes,
    * accumulated left-to-right along the chosen path (the same fixed
    * parenthesization an unrolled-position SQL DP produces, which is what
    * puts this number under the DuckDB oracle gate in `q_unigram_score`).
    */
  def viterbiScore(w: String, scores: Map[String, Double],
      maxPieceLen: Int): Double =
    viterbi(w, scores, maxPieceLen)
      .foldLeft(0.0)((acc, p) => acc + scores.getOrElse(p, -100.0))

  /** One hard-EM E-step: Viterbi-segment every distinct word, emit
    * (piece, usage) with usage = Σ word-count over words using the piece.
    */
  def pieceUsage(words: DataFrame, model: Model): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.logScores)
    val maxLen = model.maxPieceLen
    words.select(col("word"), col("wcnt").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val scores = bc.value
        it.flatMap { case (w, c) =>
          viterbi(w, scores, maxLen).map(p => (p, c))
        }
      }
      .toDF("piece", "usage")
      .groupBy("piece").agg(sum(col("usage")).as("usage"))
  }

  /** Full training loop; returns the fitted model. Callers that also run
    * [[pieceUsage]]/[[tokenCounts]] afterwards should build the word
    * table once ([[wordTable]] + a lazy checkpoint) and use [[fitWords]],
    * so the corpus scan and word aggregation are not repeated per phase.
    */
  def fit(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
      seedSize: Int = 2000, vocabSize: Int = 500, emRounds: Int = 2): Model = {
    val words = wordTable(docs, textCol).localCheckpoint(false)
    val model = fitWords(words, maxPieceLen, seedSize, vocabSize, emRounds)
    graft.ops.Checkpoints.release(words)
    model
  }

  /** [[fit]] over a pre-built (word, wcnt) table. */
  def fitWords(words: DataFrame, maxPieceLen: Int, seedSize: Int,
      vocabSize: Int, emRounds: Int): Model = {
    require(maxPieceLen >= 1 && vocabSize >= 1 && emRounds >= 1)
    var model = Model(seedCounts(words, maxPieceLen, seedSize), maxPieceLen)
    for (_ <- 1 to emRounds) {
      val usage = pieceUsage(words, model).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step + prune: single CODE POINTS always survive (segmentability
      // — Spark's length() counts code points, so the seed's "single
      // char" class includes supplementary characters whose Java String
      // length is 2); multi-code-point pieces keep the top vocabSize by
      // (usage desc, piece asc).
      def cps(p: String): Int = p.codePointCount(0, p.length)
      val chars = model.counts.keysIterator.filter(cps(_) == 1)
        .map(c => c -> usage.getOrElse(c, 0L)).toMap
      val multi = usage.iterator.filter(kv => cps(kv._1) > 1).toSeq
        .sortBy { case (p, u) => (-u, p) }.take(vocabSize)
      model = Model(chars ++ multi, maxPieceLen)
    }
    model
  }

  /** Final vocabulary report: (piece, piece_len, usage) under `model`,
    * from one last E-step over the distinct-word table.
    */
  def vocabulary(docs: DataFrame, textCol: String, model: Model): DataFrame =
    pieceUsage(wordTable(docs, textCol), model)
      .select(col("piece"), length(col("piece")).as("piece_len"),
        col("usage"))

  /** Per-document token counts under `model`: each DISTINCT word is
    * segmented once (map-side, broadcast vocabulary), then documents join
    * their words' piece counts and sum — the corpus text is scanned once
    * and never re-segmented per occurrence.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    tokenCounts(docs, idCol, textCol, model, wordTable(docs, textCol))

  /** [[tokenCounts]] with a caller-shared (word, wcnt) table, so a
    * fit-then-apply pipeline derives it once.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: Model, words: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.logScores)
    val maxLen = model.maxPieceLen
    val perWord = words.select(col("word")).as[String]
      .mapPartitions { it =>
        val scores = bc.value
        it.map(w => (w, viterbi(w, scores, maxLen).size.toLong))
      }
      .toDF("word", "n_pieces")
    docs
      .select(col(idCol),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).as("n_tokens"))
  }
}

package graft.queries

import graft.Tables
import graft.ops.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Text-analysis surface over the `documents` table (north-star training-
  * data operators: token counting, quality scoring, language ID,
  * fingerprinting). All pure expression trees — a single map-only stage
  * over the corpus, no shuffle, fully codegen'd.
  */
object TextQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // Token + char counting.
    "q_text_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"),
          col("n_chars"))
    }),

    // Quality scoring: punct ratio, stopword ratio, mean token length,
    // composite band score.
    "q_text_quality" -> ((s, dir) => {
      val stop = Seq("the", "a", "of", "and", "is")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextFunctions.stopwordRatio(col("text"), stop), 4).as("stopword_ratio"),
          round(TextFunctions.meanTokenLen(col("text"), stop), 4).as("mean_token_len"),
          round(TextFunctions.qualityScore(col("text"), stop), 2).as("quality"))
    }),

    // The Gopher quality-rule battery (Rae et al. 2021 A1.1) — the
    // pre-model curation gate web-scale pipelines run: length bands,
    // symbol/bullet/ellipsis ratios, alphabetic-word fraction, required
    // stop words. One map-only expression pass; the oracle restates
    // every rule in DuckDB list/string builtins.
    "q_gopher_rules" -> ((s, dir) => {
      val r = graft.text.GopherRules.report(col("text"))
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id") +: Seq(
          "word_count", "mean_word_len", "symbol_ratio", "bullet_ratio",
          "ellipsis_ratio", "alpha_ratio", "stop_hits", "r_word_count",
          "r_mean_word_len", "r_symbol", "r_bullet", "r_ellipsis",
          "r_alpha", "r_stop_words", "pass")
          .map(f => r.getField(f).as(f)): _*)
    }),

    // Language ID: marker-evidence argmax with deterministic tie-break,
    // compared against the labeled lang column.
    "q_text_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextFunctions.langId(col("text")).as("predicted"),
          (TextFunctions.langId(col("text")) === col("lang")).cast("int").as("hit"))
    }),

    // Content fingerprint: md5 of the normalized text (exact-dup key).
    "q_text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), md5(Dedup.normalizeText(col("text"))).as("digest"))
    }),

    // Corpus curation: the composed training-data filter — exact-dedup
    // survivors that clear the quality band and whose predicted language
    // agrees with the label. One scan + one dedup shuffle.
    "q_text_curation" -> ((s, dir) => {
      val stop = Seq("the", "a", "of", "and", "is")
      // quality and predicted share ONE TextStats instance (same stopword
      // list), so the pushed-down filter and the projection each cost a
      // single token pass instead of two.
      Dedup.exactByDigest(Tables.documents(s, dir), "text", "doc_id")
        .withColumn("quality", round(TextFunctions.qualityScore(col("text"), stop), 2))
        .withColumn("predicted", TextFunctions.langId(col("text"), stop))
        .filter(col("quality") >= 0.7 && col("predicted") === col("lang"))
        .select(col("doc_id"), col("lang"), col("quality"))
    }),

    // P16: the leaderboard's content-search path (case-insensitive phrase
    // alternation) through the REAL report generator, documents standing
    // in as a chat table.
    "q_content_search" -> ((s, dir) => {
      import java.sql.Timestamp
      val chat = Tables.documents(s, dir).select(
        col("source").as("Username"),
        col("text").as("Content"),
        lit(Timestamp.valueOf("2024-01-10 00:00:00")).as("Timestamp"))
      val rc = graft.reports.LeaderboardReportDef("content_search",
        sourceTable = "chat", searchPhrases = Seq("the", "data"),
        groupByColumn = "Username", countColumn = Some("Content"),
        valueColumn = None)
      val periods = Seq(graft.reports.Period("All_Time", None,
        Timestamp.valueOf("2024-02-01 00:00:00"), "All-Time"))
      graft.reports.Reports.leaderboard(chat, chat, rc, periods)
        .select(col("Username").as("username"),
          col("Count_All_Time").as("n_msgs"))
    }),

    // Deterministic train/val/test assignment (hash buckets, never rand():
    // stable under re-runs, insertions, repartitioning).
    "q_dataset_split" -> ((s, dir) => {
      graft.ops.Sharding.assignSplit(Tables.documents(s, dir), "doc_id")
        .select(col("doc_id"), col("split"))
    }),

    // Deterministic k-per-group sample (eval-set carving: 5 docs per
    // source, stable across reruns/repartitions — never rand()).
    "q_sample_per_group" -> ((s, dir) => {
      graft.ops.Sharding.sampleKPerGroup(
        Tables.documents(s, dir), Seq("source"), "doc_id", 5)
        .select(col("source"), col("doc_id"))
    }),

    // Count-Min sketch as a bounded (depth, bucket) aggregate table:
    // estimates for a fixed probe set, with the unconditional one-sided
    // guarantee (est >= exact) under the gate.
    "q_count_min" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(split(graft.ops.Dedup.normalizeText(col("text")), " "))
          .as("term"))
        .filter(col("term") =!= "")
      val sketch = graft.text.CountMin.build(toks, "term")
      val probes = s.createDataFrame(
        Seq("the", "data", "with", "zzznotaword").map(Tuple1(_)))
        .toDF("item")
      val exact = toks.groupBy(col("term").as("item"))
        .agg(count(lit(1)).as("exact"))
      graft.text.CountMin.estimate(sketch, probes, "item")
        .join(exact, Seq("item"), "left")
        .select(col("item"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") >= coalesce(col("exact"), lit(0L))).as("bounded"))
    }),

    // RAG passage retrieval: context-window chunking composed with BM25
    // over the PASSAGES (passage-level dl/df/avgdl), top-10 for the
    // 3-term query — the chunk→index→retrieve pipeline end to end.
    "q_rag_retrieve" -> ((s, dir) => {
      val chunks = graft.text.Chunker.chunk(
          Tables.documents(s, dir), "doc_id", "text", chunkSize = 50, overlap = 10)
        .withColumn("pid", col("doc_id") * 1000 + col("chunk_id"))
      val ts = graft.text.Bm25.termScores(
        chunks, "pid", "chunk_text", Seq("hash", "join", "scan"))
      ts.groupBy("pid").agg(
          max(when(col("term") === "hash", col("score"))).as("__s1"),
          max(when(col("term") === "join", col("score"))).as("__s2"),
          max(when(col("term") === "scan", col("score"))).as("__s3"))
        .select(col("pid"),
          round(coalesce(col("__s1"), lit(0.0)) + coalesce(col("__s2"), lit(0.0))
            + coalesce(col("__s3"), lit(0.0)), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("pid").asc)
        .limit(10)
        .select((col("pid") / 1000).cast("long").as("doc_id"),
          pmod(col("pid"), lit(1000L)).cast("int").as("chunk_id"), col("bm25"))
    }),

    // Tokenizer-style vocabulary ids: dense 0-based ordinals over
    // (count DESC, token) — range-partitioned local row_numbers plus
    // broadcast base offsets, never a single-partition window.
    "q_vocab_ids" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(split(graft.ops.Dedup.normalizeText(col("text")), " "))
          .as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 100)
      graft.ops.Ordinals.assign(counts,
        Seq(col("n").desc, col("token").asc))
        .select(col("token"), col("n"), col("ordinal"))
    }),

    // Deterministic global training-order shuffle: every doc gets a
    // dense 0-based position in md5(doc_id) order — a reproducible
    // pseudo-random permutation (the pre-packing corpus shuffle), built
    // on the same range-tiled ordinal machinery, never rand() and never
    // a single-partition sort.
    "q_corpus_shuffle" -> ((s, dir) =>
      graft.ops.Ordinals.assign(
        Tables.documents(s, dir).select(col("doc_id"),
          md5(col("doc_id").cast("string").cast("binary")).as("__h")),
        Seq(col("__h").asc, col("doc_id").asc))
        .select(col("doc_id"), col("ordinal").as("position"))),

    // Chi-squared distinctive terms: top-5 over-indexing tokens per
    // source (min corpus count 50) — exact contingency counts, one fixed
    // double expression tree.
    "q_distinctive_terms" -> ((s, dir) =>
      graft.text.Distinctive.chiSquaredTerms(
        Tables.documents(s, dir), "source", "text", k = 5, minCount = 50L)),

    // BPE merge induction, 3 rounds over the distinct-word vocabulary —
    // the tokenizer-training step, fully relational and bit-exact.
    "q_bpe_merges" -> ((s, dir) =>
      graft.text.Bpe.learnMerges(Tables.documents(s, dir), "text", rounds = 3)),

    // Byte-level BPE (GPT-2-style byte alphabet, hex-pair symbols): the
    // same 3 relational rounds over UTF-8 BYTES, so arbitrary input
    // tokenizes with zero UNK — unseen words fall back to byte symbols.
    "q_bpe_bytes" -> ((s, dir) =>
      graft.text.Bpe.learnMergesBytes(Tables.documents(s, dir), "text",
        rounds = 3)),

    // Apply side of the byte-level vocabulary: per-doc token counts plus
    // the fallback accounting (n_bytes) — n_tokens = n_bytes would mean
    // no merge ever fired; every word tokenizes, so UNK is impossible by
    // construction.
    "q_bpe_bytes_tokens" -> ((s, dir) =>
      graft.text.Bpe.tokenCountsBytes(Tables.documents(s, dir), "doc_id",
        "text", rounds = 3)),

    // WordPiece training: 3 likelihood-argmax merges (count(ab) /
    // (count(a)·count(b)) — frequent-together relative to frequent-
    // apart), completing the tokenizer trio next to BPE's frequency
    // argmax and Unigram's prune-down EM. All-integer evidence columns;
    // the score divides exact BIGINTs in double, so the argmax is
    // engine-exact.
    "q_wordpiece_merges" -> ((s, dir) =>
      graft.text.WordPiece.learnMerges(Tables.documents(s, dir), "text",
        rounds = 3)),

    // WordPiece apply: greedy LONGEST-MATCH token counts against the
    // learned vocabulary (not merge replay — the BERT-tokenizer
    // semantics). The longest-match table is an equi-join (substring
    // keys per distinct piece length), the walk is cap-bounded.
    "q_wordpiece_tokens" -> ((s, dir) =>
      graft.text.WordPiece.tokenCounts(Tables.documents(s, dir), "doc_id",
        "text", rounds = 3)),

    // Post-merge symbol frequencies — the vocab coverage report after the
    // same 3 BPE rounds.
    "q_bpe_vocab" -> ((s, dir) =>
      graft.text.Bpe.symbolFrequencies(Tables.documents(s, dir), "text",
        rounds = 3)),

    // The APPLY side: per-doc token counts via one join against the
    // merged vocabulary — each distinct word segmented once.
    "q_bpe_tokenize" -> ((s, dir) =>
      graft.text.Bpe.tokenCounts(Tables.documents(s, dir), "doc_id", "text",
        rounds = 3)),

    // Tokenizer fertility by language — tokens/word + chars/token under
    // the same 3-round merged vocabulary: the cross-lingual-equity
    // readout (high-fertility languages pay proportionally more sequence
    // length for the same text).
    "q_bpe_fertility" -> ((s, dir) =>
      graft.text.Bpe.fertility(Tables.documents(s, dir), "lang", "text",
        rounds = 3)),

    // The LLM-corpus flagship: the full curation pipeline composed from
    // the library operators — exact dedup (keep-first by normalized
    // digest) → quality gate (token/char bounds) → decontamination
    // against the held-out eval slice (Bloom-prefiltered exact 5-gram
    // semi-join) → deterministic md5-bucket split assignment. One
    // oracle-gated query proving the pieces COMPOSE: every stage's
    // semantics restated relationally in DuckDB.
    "q_corpus_e2e" -> ((s, dir) => {
      import graft.ops.{Decontaminate, Dedup, Sharding}
      val docs = Tables.documents(s, dir)
      val eval = docs.filter(col("doc_id") % 10 === 0)
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val toks = size(split(Dedup.normalizeText(col("text")), " "))
      val deduped = Dedup.exactByDigest(train, "text", "doc_id")
      val quality = deduped.filter(toks >= 5 && col("n_chars") <= 5000)
      val clean = Decontaminate.flagContaminated(quality, eval,
          "doc_id", "text", n = 5, bloomPrefilter = true,
          estEvalNgrams = 1L << 16)
        .filter(!col("contaminated"))
      Sharding.assignSplit(clean, "doc_id")
        .select(col("doc_id"), col("split"), toks.as("n_tokens"))
    }),

    // Compression-ratio redundancy screen, HASH-GATED via invariants:
    // the raw DEFLATE byte count is zlib-implementation-defined, so the
    // gate checks what IS engine-independent — exact per-doc utf8_bytes
    // (data-dependent, the oracle recomputes it), the zlib compressBound
    // upper bound, the stream-framing lower bound, and that ≥200-byte
    // documents of this corpus strictly compress (any sane DEFLATE does;
    // short docs are exempt because header overhead makes the boundary
    // implementation-sensitive). The ratio itself stays a downstream
    // division on the library struct; CompressStatsSpec pins repetitive ≪
    // prose, bounds, and null/empty handling.
    "q_compress_ratio" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.expr.CompressStats.stats(col("text")).as("cs"))
        .select(col("doc_id"), col("cs.utf8_bytes").as("utf8_bytes"),
          (col("cs.deflate_bytes") >= 8L).as("lower_ok"),
          (col("cs.deflate_bytes") <=
            col("cs.utf8_bytes") + floor(col("cs.utf8_bytes") / 1000L).cast("long")
              + 64L).as("upper_ok"),
          (col("cs.utf8_bytes") < 200L ||
            col("cs.deflate_bytes") < col("cs.utf8_bytes")).as("compresses_ok"))
    }),

    // Unigram-LM (SentencePiece-style) tokenizer, hard-EM over the
    // distinct-word table: final piece vocabulary with integer usage.
    // ORACLE-GATED: the DuckDB side replays the whole fit — seed counts,
    // two Viterbi E-steps WITH BACKTRACE (positions unrolled as
    // MATERIALIZED CTEs, backpointers recovered by re-matching the
    // winning candidate, largest piece first — the same tie-break as
    // UnigramLm.viterbi), prune-to-vocab, and the final usage pass.
    // Words are capped at UnigramOracleCap chars on BOTH sides to bound
    // the unroll (the q_unigram_score precedent).
    "q_unigram_vocab" -> ((s, dir) => {
      import graft.text.UnigramLm
      val docs = Tables.documents(s, dir)
      // One word table feeds both the fit and the final usage report.
      val words = UnigramLm.wordTable(docs, "text")
        .filter(length(col("word")) <= UnigramOracleCap)
        .localCheckpoint(false)
      val model = UnigramLm.fitWords(words,
        maxPieceLen = 5, seedSize = 400, vocabSize = 150, emRounds = 2)
      UnigramLm.pieceUsage(words, model)
        .select(col("piece"), length(col("piece")).as("piece_len"),
          col("usage"))
    }),

    // The Viterbi DP core under the ORACLE gate: per distinct word, the
    // best-segmentation log score under the deterministic SEED model
    // (maxPieceLen 3, top-20 multi-char pieces + all single chars).
    // DuckDB replays the same DP with positions unrolled as CTEs —
    // identical max/add structure, so scores match to the round(4)
    // contract. Words are capped at 12 chars to bound the unroll.
    "q_unigram_score" -> ((s, dir) => {
      import graft.text.UnigramLm
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val words = UnigramLm.wordTable(docs, "text").localCheckpoint(false)
      val model = UnigramLm.Model(
        UnigramLm.seedCounts(words, maxPieceLen = 3, seedSize = 20), 3)
      val bc = s.sparkContext.broadcast(model.logScores)
      words.filter(length(col("word")) <= 12)
        .select(col("word"), col("wcnt").cast("long"))
        .as[(String, Long)]
        .mapPartitions { it =>
          val m = bc.value
          it.map { case (w, c) => (w, c, UnigramLm.viterbiScore(w, m, 3)) }
        }
        .toDF("word", "wcnt", "score")
        .select(col("word"), col("wcnt"),
          (round(col("score"), 4) + lit(0.0)).as("score"))
    }),

    // Apply side of the same model: per-document token counts — each
    // distinct word segmented once, counts joined back by word. Same
    // word-length cap as q_unigram_vocab (capped words drop out of the
    // count on both sides — the inner join by word).
    "q_unigram_tokens" -> ((s, dir) => {
      import graft.text.UnigramLm
      val docs = Tables.documents(s, dir)
      val words = UnigramLm.wordTable(docs, "text")
        .filter(length(col("word")) <= UnigramOracleCap)
        .localCheckpoint(false)
      val model = UnigramLm.fitWords(words,
        maxPieceLen = 5, seedSize = 400, vocabSize = 150, emRounds = 2)
      UnigramLm.tokenCounts(docs, "doc_id", "text", model, words)
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // 100 docs weighted by length, drawn from hash-derived uniforms —
    // the same sample on every engine, rerun, and partitioning.
    "q_weighted_sample" -> ((s, dir) => {
      graft.ops.Sharding.weightedSample(
        Tables.documents(s, dir), "doc_id", "n_chars", 100)
        .select(col("doc_id"), col("n_chars"))
    }),

    // Misra-Gries heavy-hitter tokens per language, under the
    // bounded-guarantee gate: n_heavy is exact (DuckDB reproduces it);
    // all_found asserts the sketch's deterministic guarantee — every token
    // with count > n/k is in the O(k) summary. The sketch never shuffles
    // the token universe; exact counts here exist only to JUDGE it.
    "q_freq_tokens" -> ((s, dir) => {
      val k = 50
      val toks = Tables.documents(s, dir)
        .select(col("lang"),
          explode(split(graft.ops.Dedup.normalizeText(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val sketch = toks.groupBy("lang")
        .agg(graft.expr.FreqItemsAgg.freqItems(col("tok"), k).as("sk"))
      val n = toks.groupBy("lang").agg(count(lit(1)).as("n"))
      val heavy = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        .join(n, "lang").filter(col("cnt") * k > col("n"))
      heavy.join(sketch, "lang")
        .withColumn("found", exists(col("sk"), e => e.getField("item") === col("tok")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_heavy"), bool_and(col("found")).as("all_found"))
    }),

    // Domain-mixture resampling: retarget the corpus to 50/20/20/10
    // en/de/es/fr by n_chars weight (zh dropped — not in the target),
    // keeping the maximum total weight that satisfies the mixture, via
    // deterministic threshold-hash sampling (map-only; rerun-stable; a
    // smaller fraction keeps a strict subset). Fraction arithmetic is
    // bit-reproducible across engines because integer-valued weights sum
    // exactly in doubles (< 2^53) regardless of aggregation order.
    "q_mixture_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = Map("en" -> 0.5, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1)
      val fr = graft.ops.Sharding.mixtureFractions(docs, "lang", "n_chars", target)
      graft.ops.Sharding.sampleMixture(docs, "lang", "doc_id", fr)
        .select(col("doc_id"), col("lang"))
    }),

    // Epoch-mixing upsampling WITH replacement: en seen 2.5×, de 1×,
    // es 0.25×, fr dropped — deterministic fractional copies, epoch ids
    // distinguish repeats. (Fractions 0.5/0.25 are exactly representable,
    // so the floored 2^60 thresholds match on any engine.)
    "q_mixture_upsample" -> ((s, dir) => {
      graft.ops.Sharding.upsampleMixture(Tables.documents(s, dir), "lang",
        "doc_id", Map("en" -> 2.5, "de" -> 1.0, "es" -> 0.25))
        .select(col("doc_id"), col("lang"), col("epoch"))
    }),

    // Token-budget shard packing in deterministic hash order — the
    // distributed-prefix-sum formulation (see ops.Sharding.packByBudget);
    // must equal DuckDB's single global running-sum window bit-for-bit.
    "q_pack_shards" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.text.TextFunctions.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Sharding.packByBudget(docs, "doc_id", "n_tokens", 4096L, numBuckets = 16)
        .select(col("doc_id"), col("n_tokens"), col("shard_id"))
    }),

    // Gopher-style repetition signals: duplicated-token / top-bigram /
    // duplicated-trigram fractions per document (see text.Repetition).
    "q_text_repetition" -> ((s, dir) => {
      graft.text.Repetition.profile(Tables.documents(s, dir), "doc_id", "text")
    }),

    // TF-IDF salience: top-3 terms per document by tf·ln(N/df), over the
    // same normalize-and-split tokens as the dedup family (see
    // text.TfIdf for the three-key-partitioned-shuffles shape).
    "q_tfidf" -> ((s, dir) => {
      graft.text.TfIdf.topTerms(Tables.documents(s, dir), "doc_id", "text", 3)
    }),

    // Context-window chunking: 50-token chunks, 10-token overlap (see
    // text.Chunker — map-only, integer-exact chunk counts). Chunk text
    // rides as md5 so the gate checks content without megabyte rows.
    "q_chunk_documents" -> ((s, dir) => {
      graft.text.Chunker.chunk(Tables.documents(s, dir), "doc_id", "text", 50, 10)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
    }),

    // BM25 relevance for the query {hash, join, scan} (see text.Bm25).
    // Per-term partial scores come back from the operator; the final sum
    // runs in FIXED column order so the float64 additions associate
    // identically on any engine.
    "q_bm25" -> ((s, dir) => {
      val ts = graft.text.Bm25.termScores(
        Tables.documents(s, dir), "doc_id", "text", Seq("hash", "join", "scan"))
      ts.groupBy("doc_id").agg(
        max(when(col("term") === "hash", col("score"))).as("__s1"),
        max(when(col("term") === "join", col("score"))).as("__s2"),
        max(when(col("term") === "scan", col("score"))).as("__s3"))
        .select(col("doc_id"),
          round(coalesce(col("__s1"), lit(0.0)) + coalesce(col("__s2"), lit(0.0))
            + coalesce(col("__s3"), lit(0.0)), 4).as("bm25"))
    }),

    // Hybrid retrieval: the same BM25 ranking fused with a dense
    // embedding-cosine ranking (query = vector 7, embeddings align 1:1
    // with doc ids) by reciprocal-rank fusion — the standard RAG first
    // stage, no score calibration needed. Each side is a bounded top-20
    // (orderBy+limit / the broadcast top-k, never a corpus-wide window);
    // the 20-row rank windows after the cutoff are bounded by
    // construction. rrf = Σ 1/(60+rank) over ≤2 terms in fixed order —
    // cross-engine-exact doubles.
    "q_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ts = graft.text.Bm25.termScores(
        Tables.documents(s, dir), "doc_id", "text", Seq("hash", "join", "scan"))
      val bm = ts.groupBy("doc_id").agg(
          max(when(col("term") === "hash", col("score"))).as("__s1"),
          max(when(col("term") === "join", col("score"))).as("__s2"),
          max(when(col("term") === "scan", col("score"))).as("__s3"))
        .select(col("doc_id"),
          round(coalesce(col("__s1"), lit(0.0)) + coalesce(col("__s2"), lit(0.0))
            + coalesce(col("__s3"), lit(0.0)), 4).as("__bm"))
      // Both rankings feed the fusion AND the rank join-backs — truncate
      // so the corpus-wide BM25 pass and the cosine scan each run once.
      val sparse = bm.orderBy(col("__bm").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("__bm").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rank"))
        .localCheckpoint(false)
      val emb = Tables.embeddings(s, dir)
      val dense = graft.ops.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 7), emb, "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
        .localCheckpoint(false)
      graft.text.Retrieval.rrfFuse(Seq(sparse, dense), "doc_id", "rank")
        .join(sparse.select(col("doc_id"), col("rank").as("sparse_rank")),
          Seq("doc_id"), "left")
        .join(dense.select(col("doc_id"), col("rank").as("dense_rank")),
          Seq("doc_id"), "left")
        .orderBy(col("rrf").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), col("sparse_rank"), col("dense_rank"),
          (round(col("rrf"), 6) + lit(0.0)).as("rrf"))
    }),

    // Next-token statistics: top-3 bigram continuations per head word
    // with conditional probability — the corpus-exploration dual of the
    // repetition profile. Fully relational (shingle explode → two
    // partial-agg'd shuffles → per-head top-k window over that head's
    // continuations only); c1 >= 20 keeps only statistically meaningful
    // heads. Probabilities divide exact longs in float64, so any engine
    // rounds identically.
    "q_bigram_lm" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val parts = Tables.documents(s, dir)
        .select(explode(graft.expr.WordShingles.shingles(col("text"), 2)).as("bg"))
        .select(split(col("bg"), " ").as("t"))
        .select(col("t").getItem(0).as("w1"), col("t").getItem(1).as("w2"))
      val pair = parts.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val uni = pair.groupBy("w1").agg(sum("c12").as("c1"))
      val scored = pair.join(uni, "w1")
        .withColumn("p", round(col("c12").cast("double") / col("c1"), 4))
      val w = Window.partitionBy("w1").orderBy(col("p").desc, col("w2").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3 && col("c1") >= 20)
        .select(col("w1"), col("w2"), col("c12"), col("p"))
    }),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): adjacency
    // pairs become an undirected co-occurrence graph (repeated pairs =
    // multi-edges = the classic weighting), then the SAME integer
    // fixed-point PageRank as q_pagerank ranks the words — top-20 via
    // TakeOrderedAndProject. Length ≥ 4 stands in for a content-word
    // filter (no POS tagger in a pure-relational pipeline); the filter
    // applies to EDGES, so windows never span a dropped word's gap.
    "q_textrank" -> ((s, dir) => {
      // Fan out before the bigram explode — the per-row shingle work is
      // the query's CPU wall and runs single-task on the one-row-group
      // fixture scan otherwise (ops.FanOut: identity on wide inputs).
      val pairs = graft.ops.FanOut(
          Tables.documents(s, dir).select(col("text")))
        .select(explode(graft.expr.WordShingles.shingles(col("text"), 2)).as("bg"))
        .select(split(col("bg"), " ").as("t"))
        .select(col("t").getItem(0).as("w1"), col("t").getItem(1).as("w2"))
        .filter(length(col("w1")) >= 4 && length(col("w2")) >= 4 &&
          col("w1") =!= col("w2"))
      val und = pairs.unionByName(
        pairs.select(col("w2").as("w1"), col("w1").as("w2")))
      graft.graph.PageRank.ranks(und, "w1", "w2", iterations = 3)
        .orderBy(desc("rank_fp"), asc("node"))
        .limit(20)
    }),

    // Perplexity-style curation filter: per-doc average bigram
    // log-likelihood under the corpus's own MLE bigram model. Exact
    // rational probabilities, ordered per-doc term sums; round(4) absorbs
    // ln ulps (the q_bm25 contract).
    "q_lm_score" -> ((s, dir) =>
      graft.text.LmScore.avgLogProb(Tables.documents(s, dir), "doc_id", "text")),

    // Kneser–Ney-smoothed variant of the same scorer (LmScore
    // .knAvgLogProb): absolute discount + continuation-probability
    // interpolation, all statistics relational aggregates of the pair
    // table — the smoothing a production KenLM filter uses.
    "q_kn_lm" -> ((s, dir) =>
      graft.text.LmScore.knAvgLogProb(Tables.documents(s, dir), "doc_id",
        "text")),

    // Cross-corpus KN scoring (LmScore.knCrossScore): model on the even
    // doc_ids, score the odd ones — backoff and the OOV floor actually
    // fire, plus the n_unseen OOV-bigram signal. The CCNet shape: score
    // the crawl under a reference-corpus LM.
    "q_kn_crossscore" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.LmScore.knCrossScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
    }),

    // Concat-and-chunk sequence packing: documents laid end-to-end in
    // doc_id order, token stream cut into 128-token training sequences;
    // each doc reports its sequence span. Global prefix sum via range
    // tiling + broadcast offsets — no single-partition window.
    "q_seq_pack" -> ((s, dir) =>
      graft.ops.SeqPack.concatChunk(Tables.documents(s, dir), "doc_id",
        graft.text.TextFunctions.tokenCount(col("text")), window = 128)),

    // CCNet-style curation banding (Wenzek et al., LREC 2020): language-ID
    // each doc, then split every language's population into perplexity
    // terciles of the corpus-MLE bigram log-likelihood — head/middle/tail,
    // the classic "keep head+middle per language" filter. Composes the
    // langid expression, the LM scorer, and the per-group exact-quantile
    // bander; boundaries are per-language aggregates broadcast back, the
    // doc table never sorts.
    "q_ccnet_buckets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val lm = graft.text.LmScore.avgLogProb(docs, "doc_id", "text")
      // The langId regex scan is this query's second CPU wall — fan it
      // out like LmScore fans out its shingle explode (ops.FanOut).
      val lang = graft.ops.FanOut(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          TextFunctions.langId(col("text")).as("plang"))
      val scored = lm.join(lang, "doc_id")
        .select(col("doc_id"), col("plang"), col("avg_logp").as("x"))
      graft.ops.Quantiles.bucketizeByGroup(scored, "x", Seq("plang"),
        Seq(1.0 / 3, 2.0 / 3), exact = true)
        .select(col("doc_id"), col("plang"), col("x").as("avg_logp"),
          when(col("q_bucket") === 2, "head")
            .when(col("q_bucket") === 1, "middle")
            .otherwise("tail").as("band"))
    }),

    // DSIR importance weights (Xie et al., NeurIPS 2023): how much more
    // likely each doc's hashed-bigram bag is under the target domain
    // (sources src0-src4) than under the raw corpus. Feeds the weighted
    // sampler for importance resampling. Exact integer bucket counts,
    // bucket-ordered term fold, round(4) for ln ulps.
    "q_dsir_weights" -> ((s, dir) =>
      graft.text.Dsir.importanceWeights(Tables.documents(s, dir),
        "doc_id", "text",
        isTarget = col("source").isin("src0", "src1", "src2", "src3", "src4"),
        buckets = 1024, alpha = 1.0)),

    // DoReMi mixture weights (Xie et al., NeurIPS 2023): the Group-DRO
    // exponentiated-gradient update over per-source excess losses — the
    // data-engine half of DoReMi, solving the minimax mixture a measured
    // per-domain loss table implies. Proxy loss here = integer
    // bytes-per-token in milli-units; reference = 6.0 bytes/token flat.
    // One partial-agg'd shuffle to 20 domain rows, 8 driver EG steps with
    // domain-sorted normalizer folds, round(6) for exp ulps.
    "q_doremi_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("__tok",
          greatest(TextFunctions.tokenCount(col("text")), lit(1L)))
        .withColumn("loss_milli", expr("(1000 * n_chars) div __tok"))
        .withColumn("ref_milli", lit(6000L))
      graft.ml.Doremi.mixtureWeights(docs, "source",
          "loss_milli", "ref_milli", rounds = 8, eta = 0.5, smoothing = 0.05)
        .select(col("domain"), col("n_docs"),
          round(col("excess"), 6).as("excess"),
          round(col("weight"), 6).as("weight"))
    }),

    // Domain-level provenance rollup (CommonCrawl-style): URLs planted
    // deterministically from doc_id (corpus has none), hosts extracted
    // with a shared-syntax regex, grouped by registered domain.
    "q_url_domains" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" see https://sub"), (col("doc_id") % 5).cast("string"),
            lit(".example"), (col("doc_id") % 20).cast("string"),
            lit(".com/p/"), col("doc_id").cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          lit(" via http://Mirror.Example.org/x")).otherwise(lit("")))
        .as("text"))
      planted
        .select(explode(graft.text.Urls.hosts(col("text"))).as("host"))
        .select(lower(col("host")).as("lhost"),
          graft.text.Urls.registeredDomain(col("host")).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"), countDistinct(col("lhost")).as("n_hosts"))
    }),

    // HTML → text extraction (text.Html): each doc is wrapped in a
    // deterministic HTML shell (script/style payloads, a comment,
    // entities) and stripped back out; md5 + lengths pin every byte of
    // the extraction, so tag/entity/whitespace handling is what's
    // hash-checked.
    "q_html_strip" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val wrapped = concat(
        lit("<html><head><title>Doc "), id,
        lit("</title><script type=\"text/javascript\">var x = "), id,
        lit(";</script><style>.c{color:red}</style></head><body><!-- note "),
        id, lit(" --><h1>Title &amp; "), id, lit("</h1><p>"), col("text"),
        lit("</p><div class=\"foot\">footer&nbsp;link &lt;here&gt;" +
          " &#39;q&quot;</div></body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.text.Html.stripTags(wrapped).as("__clean"))
        .select(col("doc_id"), md5(col("__clean")).as("clean_md5"),
          length(col("__clean")).cast("long").as("clean_len"),
          size(split(col("__clean"), " ")).cast("long").as("n_tokens"))
    }),

    // Unicode NFC normalization (expr.NfcNormalize — codegen'd JVM
    // Normalizer) + control-char scrub: decomposed accents planted from
    // doc_id compose to single codepoints, planted BEL chars vanish;
    // lengths and md5 pin the exact normalized bytes (NFC output is
    // defined by UAX #15, so DuckDB's nfc_normalize must agree).
    "q_text_normalize" -> ((s, dir) => {
      val base = element_at(array(lit("a"), lit("e"), lit("o")),
        (col("doc_id") % 3 + 1).cast("int"))
      val comb = element_at(array(lit("\u0301"), lit("\u0300"),
        lit("\u0308"), lit("\u0303")), (col("doc_id") % 4 + 1).cast("int"))
      val ctl = when(col("doc_id") % 5 === 0, lit("\u0007"))
        .otherwise(lit(""))
      val planted = concat(lit("nfc "), base, comb, lit(" mid"), ctl,
        lit(" "), col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), planted.as("__raw"))
        .select(col("doc_id"), col("__raw"),
          regexp_replace(col("__raw"),
            "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "").as("__noctl"))
        .select(col("doc_id"),
          length(col("__raw")).cast("long").as("len_raw"),
          (length(col("__raw")) - length(col("__noctl"))).cast("long")
            .as("n_ctl"),
          length(graft.expr.NfcNormalize.nfc(col("__noctl"))).cast("long")
            .as("len_nfc"),
          md5(graft.expr.NfcNormalize.nfc(col("__noctl"))).as("nfc_md5"))
    }),

    // Link extraction → canonical link graph (Html.linkHrefs/linkAnchors
    // ∘ Urls.canonicalize): planted anchors come out as a per-domain
    // edge summary — the web-graph construction step PageRank and
    // domain-level corpus weighting start from. Map-only extraction; one
    // domain-keyed partial-agg'd shuffle.
    "q_html_links" -> ((s, dir) => {
      val id = col("doc_id")
      val html = concat(
        lit("<p>intro</p><a href=\"HTTPS://Link"), (id % 7).cast("string"),
        lit(".Example.COM:443/a/"), (id % 5).cast("string"),
        lit("?utm_source=z\">anchor "), (id % 11).cast("string"), lit("</a>"),
        when(id % 3 === 0, concat(
          lit("<div><a class=\"x\" href=\"http://other"),
          (id % 4).cast("string"),
          lit(".example.org/p#f\">second\nlink</a></div>")))
          .otherwise(lit("")),
        lit("<b>not a link</b>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), html.as("__html"))
        .select(col("doc_id"),
          graft.text.Html.linkAnchors(col("__html")).as("__anchors"),
          posexplode(graft.text.Html.linkHrefs(col("__html")))
            .as(Seq("__i", "__href")))
        .select(
          graft.text.Urls.canonicalize(col("__href")).as("__canon"),
          element_at(col("__anchors"), col("__i") + 1).as("__anchor"))
        .select(col("__canon"), col("__anchor"),
          graft.text.Urls.registeredDomain(
            regexp_extract(col("__canon"), graft.text.Urls.hostPattern, 1))
            .as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_links"),
          countDistinct(col("__canon")).as("n_targets"),
          countDistinct(col("__anchor")).as("n_anchors"))
    }),

    // URL canonicalization (text.Urls.canonicalize): planted URLs with
    // mixed-case authorities, default ports, tracking params and
    // fragments collapse to their canonical keys; counts per key prove
    // the collapse (distinct raw forms, one canonical group).
    "q_url_canonical" -> ((s, dir) => {
      val u1 = concat(lit("HTTPS://Example"), (col("doc_id") % 7).cast("string"),
        lit(".COM:443/Path/"), (col("doc_id") % 5).cast("string"),
        lit("?utm_source=feed&id="), (col("doc_id") % 10).cast("string"),
        lit("&utm_campaign=c#frag"), (col("doc_id") % 9).cast("string"))
      val u2 = concat(lit("http://Mirror.example"),
        (col("doc_id") % 7).cast("string"), lit(".com:80/p?gclid=abc"),
        (col("doc_id") % 3).cast("string"))
      val urls = Tables.documents(s, dir)
        .select(explode(when(col("doc_id") % 2 === 0, array(u1, u2))
          .otherwise(array(u1))).as("url"))
      urls.select(graft.text.Urls.canonicalize(col("url")).as("canon_url"))
        .groupBy("canon_url")
        .agg(count(lit(1)).as("n"))
    }),

    // PII scrub. The synthetic corpus is PII-free, so deterministic PII is
    // planted from doc_id — identically in the oracle SQL below — giving
    // the gate true positives (counts, placement) AND true negatives (the
    // untouched remainder hashes identically after redaction).
    "q_pii_redact" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 200).cast("string"),
            lit(".77"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
      planted.select(col("doc_id"),
        graft.text.Redact.emailCount(col("text")).as("n_emails"),
        graft.text.Redact.ipCount(col("text")).as("n_ips"),
        graft.text.Redact.phoneCount(col("text")).as("n_phones"),
        md5(graft.text.Redact.redact(col("text"))).as("redacted_md5"))
    }),

    // Quality-classifier inference: hashed-feature linear scoring with the
    // deterministic synthetic weight vector (the trained-model slot), exact
    // integer milli-unit dot products — see text.HashedLinear.
    "q_quality_score" -> ((s, dir) => {
      graft.text.HashedLinear.score(Tables.documents(s, dir), "doc_id",
        "text", graft.text.HashedLinear.syntheticWeights(s, 4096), 4096)
        .select(col("doc_id"), col("score_milli"), col("keep"))
    }),

    // Quality-classifier TRAINING: 4 full-batch hard-sigmoid GD steps in
    // pure integer arithmetic (one map-side-combined gradient aggregation
    // per step), then score the corpus with the trained weights. The
    // oracle below replays the whole training run as unrolled SQL CTEs —
    // the trained model itself is hash-checked, not just the scores.
    "q_train_classifier" -> ((s, dir) =>
      graft.text.LogisticTrainer.trainAndScore(
        Tables.documents(s, dir), "doc_id", "text", iters = 4)),

    // Posting-list materialization with the hapax/stop-word cuts; sorted
    // postings render deterministically on any engine.
    "q_inverted_index" -> ((s, dir) => {
      graft.text.InvertedIndex.build(Tables.documents(s, dir), "doc_id",
        "text", minDf = 2L, maxDf = 400L)
    }),

    // Bitmap-index term co-occurrence (ops.BitmapIndex): membership
    // bitsets as 64-bit words, intersection = word-aligned AND +
    // popcount. The bitmap layout is the engine's plan; the oracle is
    // the naive distinct-pair count.
    "q_bitmap_cooccur" -> ((s, dir) => {
      val terms = Seq("hash", "scan", "table", "stream", "vector", "customer")
      val mem = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(graft.ops.Dedup.normalizeText(col("text")), " "))
            .as("term"))
        .filter(col("term").isin(terms: _*))
      val bm = graft.ops.BitmapIndex.build(mem, "term", "doc_id")
      val cards = graft.ops.BitmapIndex.cardinality(bm)
      graft.ops.BitmapIndex.intersectCounts(bm)
        .join(cards.select(col("key").as("key_a"), col("card").as("n_a")),
          Seq("key_a"))
        .join(cards.select(col("key").as("key_b"), col("card").as("n_b")),
          Seq("key_b"))
        .select(col("key_a").as("term_a"), col("key_b").as("term_b"),
          col("co_card").as("co_docs"), col("n_a"), col("n_b"))
    }),

    // T5 span corruption: hash-coin masked blocks, sentinel input, span
    // target — the full denoising-objective prep, engine-exact.
    "q_span_corrupt" -> ((s, dir) => {
      graft.text.SpanCorruption.corrupt(Tables.documents(s, dir),
        "doc_id", "text", stride = 5, spanLen = 3, rate = 3)
    }),

    // Exact-phrase search by positional-postings intersection: each
    // term's postings start-aligned and equi-joined on (doc, pos) — the
    // oracle recomputes occurrences by direct token-window scan.
    "q_phrase_search" -> ((s, dir) => {
      graft.text.InvertedIndex.phraseSearch(Tables.documents(s, dir),
        "doc_id", "text",
        Seq("slow hash batch", "part filter scan", "row column sort"))
    }))

  // Corpus-MLE bigram LM restated in DuckDB, shared by q_lm_score and
  // q_ccnet_buckets: doc-level pair counts → exact rational probabilities
  // → per-doc ordered term fold.
  private val lmCtes: String =
    s"""bgd AS (
       |  SELECT doc_id, unnest(${OracleSql.shinglesSqlN(2)}) AS bg
       |  FROM documents),
       |pt AS (SELECT doc_id, string_split(bg, ' ')[1] AS w1,
       |              string_split(bg, ' ')[2] AS w2 FROM bgd),
       |dp AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM pt GROUP BY 1, 2, 3),
       |pair AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS c12
       |         FROM dp GROUP BY 1, 2),
       |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY 1),
       |pr AS (SELECT w1, w2, c12 / CAST(c1 AS DOUBLE) AS p
       |       FROM pair JOIN uni USING (w1)),
       |terms AS (
       |  SELECT dp.doc_id, dp.cnt, dp.w1, dp.w2, dp.cnt * ln(pr.p) AS term
       |  FROM dp JOIN pr USING (w1, w2))""".stripMargin

  private val lmSelect: String =
    """SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      |  round(list_sum(list(term ORDER BY w1, w2)) /
      |    CAST(sum(cnt) AS BIGINT), 4) AS avg_logp
      |FROM terms GROUP BY doc_id""".stripMargin

  private val markerSql: Map[String, String] =
    TextFunctions.langMarkers.map { case (l, ws) =>
      l -> s"len(list_filter(__toks, t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))"
    }

  // Same argmax order as TextFunctions.langId: languages in sorted order,
  // strictly-greater replaces, so the earliest max wins ties.
  private val langCase: String = {
    val langs = TextFunctions.langMarkers.keys.toSeq.sorted
    val mx = s"greatest(${langs.map(l => s"__n_$l").mkString(",")})"
    val whens = langs.map(l => s"WHEN __n_$l = $mx THEN '$l'").mkString(" ")
    s"CASE WHEN $mx = 0 THEN 'und' $whens END"
  }

  /** Unrolled-SQL replay of [[graft.text.LogisticTrainer.trainAndScore]]:
    * per GD iteration k, a gradient CTE (`g_k`: d integer sums against the
    * previous single-row weight CTE) and a weight CTE (`wi_k`). All
    * arithmetic matches the Spark side operation-for-operation (integer
    * sums; `floor(double)` for the two divisions), so the final weights —
    * and therefore every score — hash-match exactly.
    */
  private def trainClassifierSql(iters: Int, lrNum: Long, lrDen: Long,
      theta: Int): String = {
    val en = TextFunctions.langMarkers("en").map(w => s"'$w'").mkString(",")
    val d = graft.text.LogisticTrainer.featureCols.size
    val idx = 0 until d
    def z(wRef: String) = idx.map(j => s"x$j * $wRef.w$j").mkString(" + ")
    def p(zSql: String) =
      s"greatest(0, least(1000, 500 + CAST(floor(($zSql) / 4000.0) AS BIGINT)))"
    val ntoks = "CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(__toks) END"
    val evEn = s"len(list_filter(__toks, t -> t IN ($en)))"
    val steps = (1 to iters).map { k =>
      val prev = s"wi${k - 1}"
      s"""g$k AS (
         |  SELECT ${idx.map(j =>
              s"CAST(sum((label * 1000 - ${p(z(prev))}) * x$j) AS BIGINT) AS g$j")
              .mkString(",\n    ")}
         |  FROM f, $prev),
         |wi$k AS (
         |  SELECT ${idx.map(j =>
              s"$prev.w$j + CAST(floor(g$j * $lrNum / (n * $lrDen)) AS BIGINT) AS w$j")
              .mkString(",\n    ")}
         |  FROM g$k, $prev, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    string_split_regex(trim(lower(text)), '\\s+') AS __toks
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    CAST(($ntoks) + 10 * $evEn >= $theta AS INT) AS label,
       |    CAST(1 AS BIGINT) AS x0,
       |    least($ntoks, 200) - 55 AS x1,
       |    least($evEn, 50) - 3 AS x2,
       |    least(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')), 100) AS x3,
       |    least(len(text) // 10, 300) - 30 AS x4
       |  FROM t),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
       |wi0 AS (SELECT ${idx.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
       |$steps,
       |scored AS (
       |  SELECT f.doc_id, f.label, ${z(s"wi$iters")} AS z_micro FROM f, wi$iters)
       |SELECT doc_id, label, z_micro,
       |  ${p("z_micro")} AS p_milli,
       |  CAST(${p("z_micro")} > 500 AS INT) AS pred
       |FROM scored""".stripMargin
  }

  /** Shared 3-round BPE chain (w → s0 → p/t/m/s per round), closed by a
    * caller-supplied final SELECT over the t1..t3 / s3 CTEs.
    */
  private def bpeSql(finalSelect: String,
      s0: String = """SELECT word, wcnt,
        |  list_transform(range(1, len(word) + 1), i -> word[i]) AS s
        |FROM w""".stripMargin): String = {
    def round(r: Int): String = {
      val prev = s"s${r - 1}"
      s"""p$r AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(wcnt) AS BIGINT) AS c FROM (
         |    SELECT wcnt, unnest(list_transform(range(1, len(s)),
         |      i -> struct_pack(a := s[i], b := s[i+1]))) AS pr
         |    FROM $prev)
         |  GROUP BY 1, 2),
         |t$r AS MATERIALIZED (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |m$r AS (
         |  SELECT word, wcnt, s, 1 AS i, CAST([] AS VARCHAR[]) AS out FROM $prev
         |  UNION ALL
         |  SELECT m$r.word, m$r.wcnt, m$r.s,
         |    CASE WHEN m$r.i < len(m$r.s) AND m$r.s[m$r.i] = t$r.a AND m$r.s[m$r.i+1] = t$r.b
         |      THEN m$r.i + 2 ELSE m$r.i + 1 END,
         |    list_append(m$r.out,
         |      CASE WHEN m$r.i < len(m$r.s) AND m$r.s[m$r.i] = t$r.a AND m$r.s[m$r.i+1] = t$r.b
         |        THEN t$r.a || t$r.b ELSE m$r.s[m$r.i] END)
         |  FROM m$r, t$r WHERE m$r.i <= len(m$r.s)),
         |s$r AS MATERIALIZED (
         |  SELECT word, wcnt, out AS s FROM m$r WHERE i = len(s) + 1
         |  UNION ALL
         |  SELECT word, wcnt, s FROM $prev
         |  WHERE NOT EXISTS (SELECT 1 FROM t$r))"""
        .stripMargin
    }
    s"""WITH RECURSIVE
       |w AS MATERIALIZED (SELECT tok AS word, count(*) AS wcnt FROM
       |  (SELECT unnest(${OracleSql.toksSql}) AS tok FROM documents)
       |  WHERE tok <> '' GROUP BY 1),
       |s0 AS ($s0),
       |${(1 to 3).map(round).mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  /** Shared 3-round WordPiece chain: like [[bpeSql]] but each round adds
    * a symbol-count CTE and the argmax picks by LIKELIHOOD score
    * `pair_count / (left_count · right_count)` (exact BIGINTs divided in
    * double — engine-exact), tie-broken on the pair. Closed by a
    * caller-supplied final SELECT over t1..t3 / s3 / w.
    */
  private def wordpieceSql(finalSelect: String): String = {
    def round(r: Int): String = {
      val prev = s"s${r - 1}"
      s"""c$r AS (
         |  SELECT sym, CAST(sum(wcnt) AS BIGINT) AS sc FROM (
         |    SELECT wcnt, unnest(s) AS sym FROM $prev)
         |  GROUP BY 1),
         |p$r AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(wcnt) AS BIGINT) AS c FROM (
         |    SELECT wcnt, unnest(list_transform(range(1, len(s)),
         |      i -> struct_pack(a := s[i], b := s[i+1]))) AS pr
         |    FROM $prev)
         |  GROUP BY 1, 2),
         |t$r AS MATERIALIZED (
         |  SELECT p$r.a, p$r.b, p$r.c, ca.sc AS ac, cb.sc AS bc
         |  FROM p$r JOIN c$r ca ON ca.sym = p$r.a
         |    JOIN c$r cb ON cb.sym = p$r.b
         |  ORDER BY CAST(p$r.c AS DOUBLE) / (ca.sc * cb.sc) DESC,
         |    p$r.a, p$r.b
         |  LIMIT 1),
         |m$r AS (
         |  SELECT word, wcnt, s, 1 AS i, CAST([] AS VARCHAR[]) AS out FROM $prev
         |  UNION ALL
         |  SELECT m$r.word, m$r.wcnt, m$r.s,
         |    CASE WHEN m$r.i < len(m$r.s) AND m$r.s[m$r.i] = t$r.a AND m$r.s[m$r.i+1] = t$r.b
         |      THEN m$r.i + 2 ELSE m$r.i + 1 END,
         |    list_append(m$r.out,
         |      CASE WHEN m$r.i < len(m$r.s) AND m$r.s[m$r.i] = t$r.a AND m$r.s[m$r.i+1] = t$r.b
         |        THEN t$r.a || t$r.b ELSE m$r.s[m$r.i] END)
         |  FROM m$r, t$r WHERE m$r.i <= len(m$r.s)),
         |s$r AS MATERIALIZED (
         |  SELECT word, wcnt, out AS s FROM m$r WHERE i = len(s) + 1
         |  UNION ALL
         |  SELECT word, wcnt, s FROM $prev
         |  WHERE NOT EXISTS (SELECT 1 FROM t$r))"""
        .stripMargin
    }
    s"""WITH RECURSIVE
       |w AS MATERIALIZED (SELECT tok AS word, count(*) AS wcnt FROM
       |  (SELECT unnest(${OracleSql.toksSql}) AS tok FROM documents)
       |  WHERE tok <> '' GROUP BY 1),
       |s0 AS (SELECT word, wcnt,
       |  list_transform(range(1, len(word) + 1), i -> word[i]) AS s
       |FROM w),
       |${(1 to 3).map(round).mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  /** Word-length cap shared by the unigram-LM fit queries and their
    * oracles: the SQL side unrolls Viterbi positions 1..cap as CTEs, so
    * both sides restrict the fitted word table to words of at most this
    * many chars (the q_unigram_score precedent; longer "words" are URL/
    * noise-shaped in a real corpus and out-of-model by definition here).
    */
  val UnigramOracleCap = 12

  /** q_compress_ratio's oracle: exact byte accounting plus the
    * analytically-true invariant booleans (see the query's comment).
    */
  private val compressRatioSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS utf8_bytes,
      |  CASE WHEN text IS NULL THEN NULL ELSE TRUE END AS lower_ok,
      |  CASE WHEN text IS NULL THEN NULL ELSE TRUE END AS upper_ok,
      |  CASE WHEN text IS NULL THEN NULL ELSE TRUE END AS compresses_ok
      |FROM documents""".stripMargin

  /** DuckDB replay of [[graft.text.UnigramLm.fitWords]] + one final
    * E-step — the full hard-EM: seed substring counts, then per pass
    * a Viterbi DP with positions unrolled as MATERIALIZED CTEs AND the
    * backtrace recovered by re-matching the winning candidate (largest
    * piece length first — exactly UnigramLm.viterbi's smallest-start-j
    * tie-break), piece usage from the path occurrences, and an M-step
    * prune (all single chars survive; top-`vocab` multi-char pieces by
    * usage desc, piece asc). Integer usage counts and the identical
    * add/max double structure make every pass engine-exact — the same
    * argument that put q_unigram_score under the hash gate.
    *
    * Emits the WITH-prologue through `us3` (final piece usage) and
    * `occ3` (final per-word piece occurrences); callers append the
    * report SELECT.
    */
  private def unigramEmSql(maxPiece: Int, seed: Int, vocab: Int): String = {
    val L = UnigramOracleCap
    // Viterbi pass `r` scored by `sc`: dp CTEs with backtrace, path
    // extraction, piece occurrences, and integer usage counts.
    def pass(r: Int, sc: String): String = {
      def dp(i: Int): String = {
        val ks = (1 to math.min(maxPiece, i))
        val cands = ks.map { k =>
          val prev =
            if (i - k == 0) "CAST(0 AS DOUBLE)"
            else s"(SELECT f FROM dp${r}_${i - k} p WHERE p.word = d.word)"
          s"      ($prev +\n" +
            s"       (SELECT s FROM $sc q WHERE q.piece = substring(d.word, ${i - k + 1}, $k))) AS c$k"
        }
        // Backtrace: the FIRST candidate (largest k = smallest start j)
        // equal to the max is the one UnigramLm.viterbi keeps — its
        // ascending-j loop sets the winner first and ties never replace.
        val back = ks.reverse
          .map(k => s"WHEN c$k = f THEN ${i - k}")
          .mkString(" ")
        s"""dp${r}_$i AS MATERIALIZED (
           |  SELECT word, f, CASE $back END AS back
           |  FROM (
           |    SELECT word, greatest(${ks.map("c" + _).mkString(", ")}) AS f,
           |      ${ks.map("c" + _).mkString(", ")}
           |    FROM (
           |      SELECT d.word,
           |${cands.mkString(",\n")}
           |      FROM wl d WHERE length(d.word) >= $i) x) y)""".stripMargin
      }
      val bta = (1 to L)
        .map(i => s"  SELECT word, $i AS pos, back FROM dp${r}_$i")
        .mkString("\n  UNION ALL\n")
      def pp(s2: Int): String =
        if (s2 == 0)
          s"pp${r}_0 AS MATERIALIZED (SELECT word, length(word) AS pos FROM wl)"
        else
          s"""pp${r}_$s2 AS MATERIALIZED (
             |  SELECT p.word, b.back AS pos
             |  FROM pp${r}_${s2 - 1} p JOIN bta$r b
             |    ON b.word = p.word AND b.pos = p.pos
             |  WHERE p.pos > 0)""".stripMargin
      val ppu = (0 until L)
        .map(s2 => s"SELECT word, pos FROM pp${r}_$s2")
        .mkString("\n    UNION ALL ")
      s"""${(1 to L).map(dp).mkString(",\n")},
         |bta$r AS MATERIALIZED (
         |$bta),
         |${(0 until L).map(pp).mkString(",\n")},
         |occ$r AS MATERIALIZED (
         |  SELECT p.word, substring(p.word, b.back + 1, p.pos - b.back) AS piece
         |  FROM ($ppu) p
         |  JOIN bta$r b ON b.word = p.word AND b.pos = p.pos
         |  WHERE p.pos > 0),
         |us$r AS MATERIALIZED (
         |  SELECT piece, CAST(sum(w.wcnt) AS BIGINT) AS usage
         |  FROM occ$r o JOIN wl w ON w.word = o.word GROUP BY piece)""".stripMargin
    }
    // M-step after pass r: every single char survives (usage 0 when the
    // pass never chose it), top-`vocab` multi-char pieces by usage.
    def prune(r: Int): String =
      s"""m$r AS MATERIALIZED (
         |  SELECT c.piece, coalesce(u.usage, CAST(0 AS BIGINT)) AS cnt
         |  FROM chr c LEFT JOIN us$r u ON u.piece = c.piece
         |  UNION ALL
         |  SELECT piece, usage AS cnt FROM (
         |    SELECT piece, usage FROM us$r WHERE length(piece) > 1
         |    ORDER BY usage DESC, piece ASC LIMIT $vocab)),
         |t$r AS (SELECT sum(cnt + 1) AS t FROM m$r),
         |sc$r AS MATERIALIZED (SELECT piece, ln((cnt + 1) / t) AS s FROM m$r, t$r)""".stripMargin
    s"""WITH wrd AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(${OracleSql.toksSql}) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |wl AS MATERIALIZED (SELECT * FROM wrd WHERE length(word) <= $L),
       |subs AS MATERIALIZED (
       |  SELECT piece, CAST(sum(wcnt) AS BIGINT) AS pcnt FROM (
       |    SELECT substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece, wcnt
       |    FROM wl, range(1, ${L + 1}) t(i), range(1, ${maxPiece + 1}) u(l)
       |    WHERE i + l - 1 <= length(word))
       |  GROUP BY piece),
       |chr AS MATERIALIZED (SELECT piece FROM subs WHERE length(piece) = 1),
       |m0 AS MATERIALIZED (
       |  SELECT piece, pcnt AS cnt FROM subs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, pcnt AS cnt FROM (
       |    SELECT piece, pcnt FROM subs WHERE length(piece) > 1
       |    ORDER BY pcnt DESC, piece ASC LIMIT $seed)),
       |t0 AS (SELECT sum(cnt + 1) AS t FROM m0),
       |sc0 AS MATERIALIZED (SELECT piece, ln((cnt + 1) / t) AS s FROM m0, t0),
       |${pass(1, "sc0")},
       |${prune(1)},
       |${pass(2, "sc1")},
       |${prune(2)},
       |${pass(3, "sc2")}""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_train_classifier" -> trainClassifierSql(4, 1L, 1L, 90),
    "q_compress_ratio" -> compressRatioSql,

    // Full hard-EM replay (see unigramEmSql): final vocabulary usage.
    "q_unigram_vocab" ->
      s"""${unigramEmSql(maxPiece = 5, seed = 400, vocab = 150)}
         |SELECT piece, CAST(length(piece) AS INT) AS piece_len, usage
         |FROM us3""".stripMargin,

    // Same replay, apply side: per-word piece counts from the final
    // segmentation joined back to documents by word and summed.
    "q_unigram_tokens" ->
      s"""${unigramEmSql(maxPiece = 5, seed = 400, vocab = 150)}
         |, np AS (SELECT word, CAST(count(*) AS BIGINT) AS np FROM occ3 GROUP BY word)
         |SELECT t.doc_id, CAST(sum(u.np) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id, unnest(${OracleSql.toksSql}) AS word FROM documents) t
         |JOIN np u ON u.word = t.word
         |WHERE t.word <> ''
         |GROUP BY t.doc_id""".stripMargin,
    // The sketch rebuilt in SQL from the same md5-seeded buckets; the
    // estimate and the one-sided bound must agree exactly.
    "q_count_min" ->
      s"""WITH toks AS (
         |  SELECT unnest(${OracleSql.toksSql}) AS term FROM documents),
         |t AS (SELECT term FROM toks WHERE term <> ''),
         |e AS (
         |  SELECT term, d,
         |    CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '_' || term), 1, 15)) AS BIGINT)
         |      % 1024 AS bucket
         |  FROM t, range(0, 4) r(d)),
         |sk AS (SELECT d, bucket, count(*) AS cnt FROM e GROUP BY 1, 2),
         |pr AS (SELECT unnest(['the', 'data', 'with', 'zzznotaword']) AS item),
         |pb AS (
         |  SELECT item, d,
         |    CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '_' || item), 1, 15)) AS BIGINT)
         |      % 1024 AS bucket
         |  FROM pr, range(0, 4) r(d)),
         |est AS (
         |  SELECT item, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
         |  FROM pb LEFT JOIN sk USING (d, bucket) GROUP BY 1),
         |ex AS (SELECT term AS item, count(*) AS exact FROM t GROUP BY 1)
         |SELECT est.item, est.est, coalesce(ex.exact, 0) AS exact,
         |  est.est >= coalesce(ex.exact, 0) AS bounded
         |FROM est LEFT JOIN ex USING (item)""".stripMargin,

    // Same chunk slices re-scored with the q_bm25 chain at passage level.
    "q_rag_retrieve" -> {
      val k1 = 1.2; val b = 0.75
      val k1p1 = (k1 + 1.0).toString; val oneMb = (1.0 - b).toString
      s"""WITH t0 AS (
         |  SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
         |c0 AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) <= 50 THEN 1
         |         ELSE (len(toks) - 11) // 40 + 1 END AS nc
         |  FROM t0),
         |ch AS (
         |  SELECT doc_id * 1000 + i AS pid,
         |    list_slice(toks, i * 40 + 1, i * 40 + 50) AS ctoks
         |  FROM (SELECT doc_id, toks, unnest(range(nc)) AS i FROM c0)),
         |toks AS (SELECT pid, unnest(ctoks) AS term FROM ch),
         |t AS (SELECT pid, term FROM toks WHERE term <> ''),
         |dl AS (SELECT pid, count(*) AS dl FROM t GROUP BY 1),
         |tf AS (SELECT pid, term, count(*) AS tf FROM t
         |       WHERE term IN ('hash', 'join', 'scan') GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |st AS (SELECT (SELECT count(*) FROM ch) AS n,
         |       (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
         |sc AS (
         |  SELECT tf.pid, tf.term,
         |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
         |    ((tf * $k1p1) / (tf + $k1 * ($oneMb + $b * (dl / avgdl)))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (pid), st),
         |p AS (SELECT pid,
         |    max(CASE WHEN term = 'hash' THEN score END) AS s1,
         |    max(CASE WHEN term = 'join' THEN score END) AS s2,
         |    max(CASE WHEN term = 'scan' THEN score END) AS s3
         |  FROM sc GROUP BY pid),
         |r AS (
         |  SELECT pid,
         |    round(coalesce(s1, 0.0) + coalesce(s2, 0.0) + coalesce(s3, 0.0), 4)
         |      AS bm25
         |  FROM p ORDER BY bm25 DESC, pid ASC LIMIT 10)
         |SELECT pid // 1000 AS doc_id, CAST(pid % 1000 AS INT) AS chunk_id, bm25
         |FROM r""".stripMargin
    },

    // The tiled ordinal must equal the one-window global row_number.
    "q_vocab_ids" ->
      s"""WITH toks AS (
         |  SELECT unnest(${OracleSql.toksSql}) AS token FROM documents),
         |c AS (SELECT token, count(*) AS n FROM toks WHERE token <> ''
         |      GROUP BY 1 HAVING count(*) >= 100)
         |SELECT token, n,
         |  row_number() OVER (ORDER BY n DESC, token ASC) - 1 AS ordinal
         |FROM c""".stripMargin,

    // Same marginals, same multiplication order, same sign gate.
    "q_distinctive_terms" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(${OracleSql.toksSql}) AS term FROM documents),
         |t AS (SELECT source, term FROM toks WHERE term <> ''),
         |st AS (SELECT source, term, count(*) AS o11 FROM t GROUP BY 1, 2),
         |tt AS (SELECT term, CAST(sum(o11) AS BIGINT) AS tt FROM st
         |       GROUP BY 1 HAVING sum(o11) >= 50),
         |stot AS (SELECT source, CAST(sum(o11) AS BIGINT) AS s FROM st GROUP BY 1),
         |n AS (SELECT CAST(sum(o11) AS BIGINT) AS n FROM st),
         |j AS (
         |  SELECT st.source, st.term, st.o11, tt.tt - st.o11 AS o12,
         |    stot.s - st.o11 AS o21, n.n - tt.tt - stot.s + st.o11 AS o22, n.n
         |  FROM st JOIN tt USING (term) JOIN stot USING (source) CROSS JOIN n),
         |sc AS (
         |  SELECT source, term, o11,
         |    CAST(o11 AS DOUBLE) * CAST(o22 AS DOUBLE)
         |      - CAST(o12 AS DOUBLE) * CAST(o21 AS DOUBLE) AS diff,
         |    CAST(n AS DOUBLE) *
         |      (CAST(o11 AS DOUBLE) * CAST(o22 AS DOUBLE)
         |        - CAST(o12 AS DOUBLE) * CAST(o21 AS DOUBLE)) *
         |      (CAST(o11 AS DOUBLE) * CAST(o22 AS DOUBLE)
         |        - CAST(o12 AS DOUBLE) * CAST(o21 AS DOUBLE)) /
         |      (CAST(o11 + o12 AS DOUBLE) * CAST(o21 + o22 AS DOUBLE)
         |        * CAST(o11 + o21 AS DOUBLE) * CAST(o12 + o22 AS DOUBLE)) AS chi2
         |  FROM j),
         |r AS (
         |  SELECT source, term, o11, chi2, row_number() OVER
         |    (PARTITION BY source ORDER BY chi2 DESC, term ASC) AS rk
         |  FROM sc WHERE diff > 0)
         |SELECT source, term, o11 AS n_in_source, round(chi2, 4) AS chi2
         |FROM r WHERE rk <= 5""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |  len(text) AS len_chars, n_chars
        |FROM documents""".stripMargin,
    "q_gopher_rules" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS words,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, text, words, lines,
        |    CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(words) END AS wc,
        |    len(text) - len(replace(text, '#', '')) AS hashes,
        |    CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS dots,
        |    len(text) - len(replace(text, '…', '')) AS uni_ell,
        |    len(list_filter(lines, l -> starts_with(ltrim(l), '-')
        |      OR starts_with(ltrim(l), '*')
        |      OR starts_with(ltrim(l), '•'))) AS n_bullet,
        |    len(list_filter(lines, l -> ends_with(rtrim(l), '...')
        |      OR ends_with(rtrim(l), '…'))) AS n_ell_end,
        |    len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
        |    len(list_intersect(list_transform(words, x -> lower(x)),
        |      ['the','be','to','of','and','that','have','with'])) AS stop_hits
        |  FROM w),
        |r AS (
        |  SELECT doc_id, wc,
        |    CASE WHEN wc = 0 THEN 0.0 ELSE
        |      CAST(list_aggregate(list_transform(words, x -> len(x)), 'sum')
        |        AS DOUBLE) / wc END AS mean_len,
        |    CASE WHEN wc = 0 THEN 1.0 ELSE
        |      CAST(hashes + dots + uni_ell AS DOUBLE) / wc END AS sym,
        |    CAST(n_bullet AS DOUBLE) / len(lines) AS bul,
        |    CAST(n_ell_end AS DOUBLE) / len(lines) AS ell,
        |    CASE WHEN wc = 0 THEN 0.0
        |      ELSE CAST(n_alpha AS DOUBLE) / wc END AS alp,
        |    stop_hits
        |  FROM m)
        |SELECT doc_id,
        |  CAST(wc AS BIGINT) AS word_count,
        |  round(mean_len, 4) AS mean_word_len,
        |  round(sym, 4) AS symbol_ratio,
        |  round(bul, 4) AS bullet_ratio,
        |  round(ell, 4) AS ellipsis_ratio,
        |  round(alp, 4) AS alpha_ratio,
        |  CAST(stop_hits AS BIGINT) AS stop_hits,
        |  wc BETWEEN 50 AND 100000 AS r_word_count,
        |  mean_len BETWEEN 3.0 AND 10.0 AS r_mean_word_len,
        |  sym <= 0.1 AS r_symbol,
        |  bul <= 0.9 AS r_bullet,
        |  ell <= 0.3 AS r_ellipsis,
        |  alp >= 0.8 AS r_alpha,
        |  stop_hits >= 2 AS r_stop_words,
        |  (wc BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
        |    AND sym <= 0.1 AND bul <= 0.9 AND ell <= 0.3 AND alp >= 0.8
        |    AND stop_hits >= 2 AS pass
        |FROM r""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS __toks,
        |    string_split_regex(trim(text), '\s+') AS __otoks
        |  FROM documents)
        |SELECT doc_id,
        |  round(CASE WHEN len(text) = 0 THEN 0.0
        |    ELSE (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |         / CAST(len(text) AS DOUBLE) END, 4) AS punct_ratio,
        |  round(CASE WHEN len(trim(text)) = 0 THEN 0.0
        |    ELSE len(list_filter(__toks, x -> x IN ('the','a','of','and','is')))
        |         / CAST(len(__toks) AS DOUBLE) END, 4) AS stopword_ratio,
        |  round(CASE WHEN len(trim(text)) = 0 THEN 0.0
        |    ELSE list_sum(list_transform(__otoks, x -> len(x)))
        |         / CAST(len(__otoks) AS DOUBLE) END, 4) AS mean_token_len,
        |  round(
        |    (CASE WHEN (CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(__otoks) END) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
        |    (CASE WHEN (CASE WHEN len(text) = 0 THEN 0.0
        |      ELSE (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |           / CAST(len(text) AS DOUBLE) END) < 0.2 THEN 0.3 ELSE 0.0 END) +
        |    (CASE WHEN (CASE WHEN len(trim(text)) = 0 THEN 0.0
        |      ELSE len(list_filter(__toks, x -> x IN ('the','a','of','and','is')))
        |           / CAST(len(__toks) AS DOUBLE) END) > 0.05 THEN 0.3 ELSE 0.0 END),
        |  2) AS quality
        |FROM t""".stripMargin,
    "q_text_langid" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    string_split_regex(trim(lower(text)), '\\s+') AS __toks
         |  FROM documents),
         |ev AS (
         |  SELECT doc_id, lang,
         |${TextFunctions.langMarkers.keys.toSeq.sorted
             .map(l => s"    ${markerSql(l)} AS __n_$l").mkString(",\n")}
         |  FROM t)
         |SELECT doc_id, lang, $langCase AS predicted,
         |  CAST(($langCase) = lang AS INT) AS hit
         |FROM ev""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest
        |FROM documents""".stripMargin,
    "q_text_curation" ->
      s"""WITH survivors AS (
         |  SELECT * FROM documents WHERE doc_id IN (
         |    SELECT min(doc_id) FROM documents
         |    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))),
         |t AS (
         |  SELECT doc_id, lang, text,
         |    string_split_regex(trim(lower(text)), '\\s+') AS __toks,
         |    string_split_regex(trim(text), '\\s+') AS __otoks
         |  FROM survivors),
         |scored AS (
         |  SELECT doc_id, lang,
         |    round(
         |      (CASE WHEN (CASE WHEN len(trim(text)) = 0 THEN 0
         |        ELSE len(__otoks) END) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
         |      (CASE WHEN (CASE WHEN len(text) = 0 THEN 0.0
         |        ELSE (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))
         |             / CAST(len(text) AS DOUBLE) END) < 0.2 THEN 0.3 ELSE 0.0 END) +
         |      (CASE WHEN (CASE WHEN len(trim(text)) = 0 THEN 0.0
         |        ELSE len(list_filter(__toks, x -> x IN ('the','a','of','and','is')))
         |             / CAST(len(__toks) AS DOUBLE) END) > 0.05 THEN 0.3 ELSE 0.0 END),
         |    2) AS quality,
         |${TextFunctions.langMarkers.keys.toSeq.sorted
             .map(l => s"    ${markerSql(l)} AS __n_$l").mkString(",\n")}
         |  FROM t)
         |SELECT doc_id, lang, quality FROM scored
         |WHERE quality >= 0.7 AND ($langCase) = lang""".stripMargin,
    "q_content_search" ->
      """SELECT source AS username, count(*) AS n_msgs
        |FROM documents
        |WHERE regexp_matches(text, '(?i)the|data')
        |GROUP BY source""".stripMargin,
    // Same md5 permutation key, same dense 0-based ordering.
    "q_corpus_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |    - 1 AS position
        |FROM documents""".stripMargin,

    // Every stage restated: keep-first digest dedup, the same token/char
    // gate, the plain distinct-5-gram semi-join (the Bloom prefilter is
    // invisible — no false negatives, positives re-checked), the same
    // md5-bucket split.
    "q_corpus_e2e" ->
      s"""WITH ev AS (
         |  SELECT DISTINCT unnest(${OracleSql.shinglesSqlN(5)}) AS sh
         |  FROM documents WHERE doc_id % 10 = 0),
         |tr AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
         |dd AS (
         |  SELECT * FROM tr WHERE doc_id IN (
         |    SELECT min(doc_id) FROM tr
         |    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))),
         |q AS (
         |  SELECT * FROM dd
         |  WHERE len(${OracleSql.toksSql}) >= 5 AND n_chars <= 5000),
         |contam AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, unnest(list_distinct(${OracleSql.shinglesSqlN(5)}))
         |      AS sh
         |    FROM q)
         |  WHERE sh IN (SELECT sh FROM ev)),
         |clean AS (
         |  SELECT * FROM q
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam))
         |SELECT doc_id,
         |  CASE WHEN b < 98 THEN 'train' WHEN b = 98 THEN 'val'
         |    ELSE 'test' END AS split,
         |  CAST(len(${OracleSql.toksSql}) AS INT) AS n_tokens
         |FROM (
         |  SELECT doc_id, text,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 100 AS b
         |  FROM clean)""".stripMargin,

    "q_dataset_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 98 THEN 'train' WHEN b = 98 THEN 'val' ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents)""".stripMargin,
    "q_sample_per_group" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
        |        doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5""".stripMargin,
    // Same three BPE rounds: pair counts via scalar-range struct unnest,
    // argmax with (count DESC, pair ASC), and the greedy left-to-right
    // merge as a RECURSIVE CTE stepping one symbol per iteration with the
    // same skip-on-match rule as the Spark fold.
    "q_bpe_merges" -> bpeSql(
      (1 to 3).map(r =>
        s"""SELECT $r AS round, a AS "left", b AS "right", a || b AS merged, c AS pair_count FROM t$r""")
        .mkString("\nUNION ALL ")),

    // The byte-level chain: identical rounds over the hex-pair byte
    // alphabet (lower(hex(encode(word))) sliced in 2s — DuckDB's hex is
    // Spark's hex, byte for byte).
    "q_bpe_bytes" -> bpeSql(
      (1 to 3).map(r =>
        s"""SELECT $r AS round, a AS "left", b AS "right", a || b AS merged, c AS pair_count FROM t$r""")
        .mkString("\nUNION ALL "),
      s0 = """SELECT word, wcnt,
        |  list_transform(range(1, len(lower(hex(encode(word)))) // 2 + 1),
        |    i -> substring(lower(hex(encode(word))), CAST(i * 2 - 1 AS INT), 2)) AS s
        |FROM w""".stripMargin),

    // Byte-level apply side: the same s3 vocabulary join as
    // q_bpe_tokenize plus exact byte totals (octet_length of the UTF-8
    // encoding — Spark's length(encode(...)) byte for byte).
    "q_bpe_bytes_tokens" -> bpeSql(
      s"""SELECT dw.doc_id, count(*) AS n_words,
         |  CAST(sum(len(s3.s)) AS BIGINT) AS n_tokens,
         |  CAST(sum(octet_length(encode(dw.word))) AS BIGINT) AS n_bytes
         |FROM (
         |  SELECT doc_id, unnest(${OracleSql.toksSql}) AS word
         |  FROM documents) dw
         |JOIN s3 ON s3.word = dw.word
         |WHERE dw.word <> ''
         |GROUP BY dw.doc_id""".stripMargin,
      s0 = """SELECT word, wcnt,
        |  list_transform(range(1, len(lower(hex(encode(word)))) // 2 + 1),
        |    i -> substring(lower(hex(encode(word))), CAST(i * 2 - 1 AS INT), 2)) AS s
        |FROM w""".stripMargin),

    // Same chain, read out as the post-merge symbol distribution.
    // Three scored argmax frames, integer evidence only.
    "q_wordpiece_merges" -> wordpieceSql(
      """SELECT 1 AS round, a AS left, b AS right, a || b AS merged,
        |  c AS pair_count, ac AS left_count, bc AS right_count FROM t1
        |UNION ALL
        |SELECT 2, a, b, a || b, c, ac, bc FROM t2
        |UNION ALL
        |SELECT 3, a, b, a || b, c, ac, bc FROM t3""".stripMargin),

    // Longest-match walk: per-position longest vocabulary piece
    // precomputed statically (join + max), then a linear recursion that
    // only follows pointers — same shape the engine runs as cap bounded
    // join rounds.
    "q_wordpiece_tokens" -> wordpieceSql(
      s""",v AS MATERIALIZED (SELECT DISTINCT piece FROM (
         |    SELECT unnest(s) AS piece FROM s3
         |    UNION ALL
         |    SELECT unnest(list_transform(range(1, len(word) + 1),
         |      i -> word[i])) AS piece FROM w)),
         |wl AS MATERIALIZED (SELECT word FROM w WHERE len(word) <= 12),
         |pos AS (SELECT word, CAST(i AS INT) AS i
         |  FROM wl, range(1, 13) t(i) WHERE i <= len(word)),
         |lm AS MATERIALIZED (SELECT p.word, p.i, max(len(v.piece)) AS k
         |  FROM pos p JOIN v ON v.piece = substring(p.word, p.i, len(v.piece))
         |  GROUP BY 1, 2),
         |wp AS (SELECT word, 1 AS i, CAST(0 AS BIGINT) AS ntok FROM wl
         |  UNION ALL
         |  SELECT wp.word, CAST(wp.i + lm.k AS INT), wp.ntok + 1
         |  FROM wp JOIN lm ON lm.word = wp.word AND lm.i = wp.i),
         |pw AS (SELECT word, ntok FROM wp WHERE i = len(word) + 1),
         |dw AS (SELECT doc_id, unnest(${OracleSql.toksSql}) AS word
         |  FROM documents)
         |SELECT dw.doc_id, count(*) AS n_words,
         |  CAST(sum(pw.ntok) AS BIGINT) AS n_tokens
         |FROM dw JOIN pw ON pw.word = dw.word
         |WHERE dw.word <> '' AND len(dw.word) <= 12
         |GROUP BY 1""".stripMargin),

    "q_bpe_vocab" -> bpeSql(
      """SELECT sym AS symbol, CAST(sum(wcnt) AS BIGINT) AS total_count
        |FROM (SELECT wcnt, unnest(s) AS sym FROM s3) GROUP BY 1""".stripMargin),

    // Same chain aggregated per language with exact integer totals and
    // two end divisions — fertility and chars/token.
    "q_bpe_fertility" -> bpeSql(
      s"""SELECT dw.lang, count(*) AS n_words,
         |  CAST(sum(len(s3.s)) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(dw.word)) AS BIGINT) AS n_chars,
         |  round(CAST(sum(len(s3.s)) AS DOUBLE) / count(*), 6) AS fertility,
         |  round(CAST(sum(length(dw.word)) AS DOUBLE) / sum(len(s3.s)), 6)
         |    AS chars_per_token
         |FROM (
         |  SELECT lang, unnest(${OracleSql.toksSql}) AS word
         |  FROM documents) dw
         |JOIN s3 ON s3.word = dw.word
         |WHERE dw.word <> ''
         |GROUP BY dw.lang""".stripMargin),

    // Apply side: per-doc word explode joined to the merged vocabulary.
    "q_bpe_tokenize" -> bpeSql(
      s"""SELECT dw.doc_id, count(*) AS n_words,
         |  CAST(sum(len(s3.s)) AS BIGINT) AS n_tokens
         |FROM (
         |  SELECT doc_id, unnest(${OracleSql.toksSql}) AS word
         |  FROM documents) dw
         |JOIN s3 ON s3.word = dw.word
         |WHERE dw.word <> ''
         |GROUP BY dw.doc_id""".stripMargin),

    // Same exponential keys: u from the 60-bit md5 prefix, key = ln(u)/w,
    // top-100 by key (doc_id tie-break).
    "q_weighted_sample" ->
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
        |      / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS k
        |  FROM documents WHERE n_chars > 0
        |  ORDER BY k DESC, doc_id LIMIT 100)""".stripMargin,
    "q_freq_tokens" ->
      """WITH toks AS (
        |  SELECT lang,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |t AS (SELECT lang, tok FROM toks WHERE tok <> ''),
        |n AS (SELECT lang, count(*) AS n FROM t GROUP BY lang),
        |exact AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY lang, tok)
        |SELECT e.lang, count(*) AS n_heavy, true AS all_found
        |FROM exact e JOIN n USING (lang)
        |WHERE e.cnt * 50 > n.n
        |GROUP BY e.lang""".stripMargin,
    // Mirrors mixtureFractions + sampleMixture exactly: same exact-integer
    // totals, same (t*s)/total double arithmetic, same floor(f*2^60)
    // integer threshold on the salted 60-bit md5 hash.
    "q_mixture_sample" ->
      """WITH tgt(lang, t) AS (VALUES
        |    ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.2 AS DOUBLE)),
        |    ('es', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE))),
        |tot AS (
        |  SELECT d.lang, sum(CAST(d.n_chars AS DOUBLE)) AS total
        |  FROM documents d JOIN tgt USING (lang) GROUP BY d.lang),
        |s AS (SELECT min(total / t) AS s FROM tot JOIN tgt USING (lang)),
        |fr AS (
        |  SELECT lang, t * (SELECT s FROM s) / total AS f
        |  FROM tot JOIN tgt USING (lang))
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN fr USING (lang)
        |WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |  < CAST(floor(f * 1152921504606846976) AS BIGINT)""".stripMargin,

    // Same whole+fractional decomposition as Sharding.upsampleMixture:
    // floor(r) copies for everyone, one extra below the floored 2^60
    // threshold on the salted hash, epoch = unnested copy index.
    "q_mixture_upsample" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 1 ELSE 0 END AS whole,
        |    CASE lang
        |      WHEN 'en' THEN CAST(floor(0.5 * 1152921504606846976) AS BIGINT)
        |      WHEN 'de' THEN 0
        |      WHEN 'es' THEN CAST(floor(0.25 * 1152921504606846976) AS BIGINT)
        |    END AS thr,
        |    CAST(('0x' || substr(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents WHERE lang IN ('en', 'de', 'es')),
        |c AS (
        |  SELECT doc_id, lang,
        |    whole + CASE WHEN h < thr THEN 1 ELSE 0 END AS copies
        |  FROM f)
        |SELECT doc_id, lang, CAST(unnest(range(copies)) AS BIGINT) AS epoch
        |FROM c WHERE copies > 0""".stripMargin,

    "q_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start_off
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  start_off // 4096 AS shard_id
        |FROM c""".stripMargin,

    // Mirrors Repetition.profile: same shingle lists, two grouped
    // reductions, conditional-agg pivot, same 0-when-gramless convention.
    "q_text_repetition" ->
      s"""WITH g AS (
         |  SELECT doc_id, 1 AS n, unnest(${OracleSql.shinglesSqlN(1)}) AS g FROM documents
         |  UNION ALL
         |  SELECT doc_id, 2 AS n, unnest(${OracleSql.shinglesSqlN(2)}) AS g FROM documents
         |  UNION ALL
         |  SELECT doc_id, 3 AS n, unnest(${OracleSql.shinglesSqlN(3)}) AS g FROM documents),
         |c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
         |s AS (SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS total,
         |        count(*) AS dis, max(c) AS top FROM c GROUP BY 1, 2),
         |p AS (SELECT doc_id,
         |    max(CASE WHEN n = 1 THEN total END) AS tok_total,
         |    max(CASE WHEN n = 1 THEN dis END) AS tok_dis,
         |    max(CASE WHEN n = 2 THEN total END) AS bg_total,
         |    max(CASE WHEN n = 2 THEN top END) AS bg_top,
         |    max(CASE WHEN n = 3 THEN total END) AS tg_total,
         |    max(CASE WHEN n = 3 THEN dis END) AS tg_dis
         |  FROM s GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(tok_total, 0) AS BIGINT) AS n_tokens,
         |  round(CASE WHEN tok_total > 0
         |    THEN (tok_total - tok_dis) / CAST(tok_total AS DOUBLE)
         |    ELSE 0.0 END, 4) AS dup_token_frac,
         |  round(CASE WHEN bg_total > 0
         |    THEN bg_top / CAST(bg_total AS DOUBLE)
         |    ELSE 0.0 END, 4) AS top_bigram_frac,
         |  round(CASE WHEN tg_total > 0
         |    THEN (tg_total - tg_dis) / CAST(tg_total AS DOUBLE)
         |    ELSE 0.0 END, 4) AS dup_trigram_frac
         |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin,

    // Same tokens as q_freq_tokens; ln on an identically-computed double
    // ratio, rounded at 4 decimals before the rank window (ties break by
    // term ascending in both engines).
    "q_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${OracleSql.toksSql}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (
         |  SELECT doc_id, term, tf,
         |    round(tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df), 4) AS tfidf
         |  FROM tf JOIN df USING (term)),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM sc)
         |SELECT doc_id, term, tf, tfidf FROM r WHERE rn <= 3""".stripMargin,

    // Same token list, same integer chunk-count arithmetic
    // ((n-11)//40 + 1 == 1 + ceil((n-50)/40)), same inclusive slices.
    "q_chunk_documents" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    CASE WHEN len(toks) <= 50 THEN 1
         |         ELSE (len(toks) - 11) // 40 + 1 END AS nc
         |  FROM t),
         |u AS (SELECT doc_id, toks, unnest(range(nc)) AS i FROM c)
         |SELECT doc_id, CAST(i AS INT) AS chunk_id,
         |  CAST(len(list_slice(toks, i * 40 + 1, i * 40 + 50)) AS INT) AS n_tokens,
         |  md5(array_to_string(list_slice(toks, i * 40 + 1, i * 40 + 50), ' '))
         |    AS chunk_md5
         |FROM u""".stripMargin,

    // Same tokens, same arithmetic association, constants interpolated
    // from the Scala doubles (shortest-roundtrip strings, so DuckDB
    // parses back the identical float64), same fixed-order final sum.
    "q_bm25" -> {
      val k1 = 1.2; val b = 0.75
      val k1p1 = (k1 + 1.0).toString; val oneMb = (1.0 - b).toString
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${OracleSql.toksSql}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
         |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
         |       WHERE term IN ('hash', 'join', 'scan') GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
         |    ((tf * $k1p1) / (tf + $k1 * ($oneMb + $b * (dl / avgdl)))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), st),
         |p AS (SELECT doc_id,
         |    max(CASE WHEN term = 'hash' THEN score END) AS s1,
         |    max(CASE WHEN term = 'join' THEN score END) AS s2,
         |    max(CASE WHEN term = 'scan' THEN score END) AS s3
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id,
         |  round(coalesce(s1, 0.0) + coalesce(s2, 0.0) + coalesce(s3, 0.0), 4)
         |    AS bm25
         |FROM p""".stripMargin
    },

    // The q_bm25 chain ranked to a top-20, the cosine ranking against
    // vector 7, then RRF: 1/(60+rank) per list, fixed-order sum.
    "q_hybrid_rrf" -> {
      val k1 = 1.2; val b = 0.75
      val k1p1 = (k1 + 1.0).toString; val oneMb = (1.0 - b).toString
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${OracleSql.toksSql}) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
         |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
         |       WHERE term IN ('hash', 'join', 'scan') GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
         |    ((tf * $k1p1) / (tf + $k1 * ($oneMb + $b * (dl / avgdl)))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), st),
         |p AS (SELECT doc_id,
         |    max(CASE WHEN term = 'hash' THEN score END) AS s1,
         |    max(CASE WHEN term = 'join' THEN score END) AS s2,
         |    max(CASE WHEN term = 'scan' THEN score END) AS s3
         |  FROM sc GROUP BY doc_id),
         |bm AS (SELECT doc_id,
         |    round(coalesce(s1, 0.0) + coalesce(s2, 0.0) + coalesce(s3, 0.0), 4)
         |      AS bm FROM p),
         |sp AS (SELECT doc_id, srank FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY bm DESC, doc_id)
         |      AS srank FROM bm)
         |  WHERE srank <= 20),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
         |dn AS (SELECT doc_id, drank FROM (
         |    SELECT e.vec_id AS doc_id,
         |      row_number() OVER (ORDER BY list_cosine_similarity(e.v, q.qv)
         |        DESC, e.vec_id) AS drank
         |    FROM e, q WHERE e.vec_id <> 7)
         |  WHERE drank <= 20),
         |f AS (SELECT doc_id,
         |    sp.srank, dn.drank,
         |    coalesce(1.0 / (60 + sp.srank), 0.0) +
         |      coalesce(1.0 / (60 + dn.drank), 0.0) AS rrf
         |  FROM sp FULL JOIN dn USING (doc_id))
         |SELECT doc_id, CAST(srank AS INT) AS sparse_rank,
         |  CAST(drank AS INT) AS dense_rank, round(rrf, 6) + 0.0 AS rrf
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
    },

    // Same bigram shingles; exact-long division rounds identically.
    "q_bigram_lm" ->
      s"""WITH bg AS (
         |  SELECT unnest(${OracleSql.shinglesSqlN(2)}) AS bg FROM documents),
         |pt AS (SELECT string_split(bg, ' ')[1] AS w1,
         |              string_split(bg, ' ')[2] AS w2 FROM bg),
         |pair AS (SELECT w1, w2, count(*) AS c12 FROM pt GROUP BY 1, 2),
         |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY 1),
         |sc AS (
         |  SELECT w1, w2, c12, c1,
         |    round(c12 / CAST(c1 AS DOUBLE), 4) AS p
         |  FROM pair JOIN uni USING (w1)),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY w1 ORDER BY p DESC, w2) AS rn FROM sc)
         |SELECT w1, w2, c12, p FROM r WHERE rn <= 3 AND c1 >= 20""".stripMargin,

    // Same co-occurrence multigraph, same integer PageRank rounds as the
    // q_pagerank oracle — node keys are words instead of ids.
    "q_textrank" ->
      s"""WITH bg AS (
         |  SELECT unnest(${OracleSql.shinglesSqlN(2)}) AS bg FROM documents),
         |pt AS (SELECT string_split(bg, ' ')[1] AS w1,
         |              string_split(bg, ' ')[2] AS w2 FROM bg),
         |pf AS (SELECT w1, w2 FROM pt
         |       WHERE length(w1) >= 4 AND length(w2) >= 4 AND w1 <> w2),
         |e AS (SELECT w1 AS src, w2 AS dst FROM pf
         |      UNION ALL SELECT w2, w1 FROM pf),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |b AS (SELECT 1000000000000 // count(*) AS base FROM nodes),
         |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         |r0 AS (SELECT node, base AS r FROM nodes, b),
         |c1 AS (SELECT e.dst AS node, CAST(sum(r0.r // deg.d) AS BIGINT) AS c
         |       FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
         |       GROUP BY e.dst),
         |r1 AS (SELECT nodes.node, (15 * base + 85 * COALESCE(c, 0)) // 100 AS r
         |       FROM nodes CROSS JOIN b LEFT JOIN c1 ON c1.node = nodes.node),
         |c2 AS (SELECT e.dst AS node, CAST(sum(r1.r // deg.d) AS BIGINT) AS c
         |       FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
         |       GROUP BY e.dst),
         |r2 AS (SELECT nodes.node, (15 * base + 85 * COALESCE(c, 0)) // 100 AS r
         |       FROM nodes CROSS JOIN b LEFT JOIN c2 ON c2.node = nodes.node),
         |c3 AS (SELECT e.dst AS node, CAST(sum(r2.r // deg.d) AS BIGINT) AS c
         |       FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src
         |       GROUP BY e.dst),
         |r3 AS (SELECT nodes.node, (15 * base + 85 * COALESCE(c, 0)) // 100 AS r
         |       FROM nodes CROSS JOIN b LEFT JOIN c3 ON c3.node = nodes.node)
         |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r3
         |ORDER BY r DESC, node LIMIT 20""".stripMargin,

    // The seed model re-derived relationally (full-length substrings,
    // top-20 multi + all single chars, add-one log scores), then the
    // Viterbi DP with positions unrolled as CTEs: dp_i = max over piece
    // lengths 1..3 of dp_{i-k} + score(substr) — greatest() ignores the
    // NULL terms where no piece matches, mirroring the DP's candidate
    // set. Same add/max structure → same doubles.
    "q_unigram_score" -> {
      val L = 12
      def dp(i: Int): String = {
        val terms = (1 to 3).filter(_ <= i).map { k =>
          s"((SELECT f FROM dp${i - k} p WHERE p.word = d.word) +\n" +
            s"       (SELECT s FROM sc WHERE piece = substring(d.word, ${i - k + 1}, $k)))"
        }
        s"""dp$i AS MATERIALIZED (
           |  SELECT d.word, greatest(
           |    ${terms.mkString(",\n    ")}) AS f
           |  FROM wl d WHERE length(d.word) >= $i)""".stripMargin
      }
      val fins = (1 to L).map(i =>
        s"SELECT d.word, d.f FROM dp$i d JOIN wl w ON w.word = d.word AND length(w.word) = $i")
        .mkString("\n  UNION ALL ")
      s"""WITH wrd AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
         |    SELECT unnest(${OracleSql.toksSql}) AS word FROM documents)
         |  WHERE word <> '' GROUP BY word),
         |wl AS MATERIALIZED (SELECT * FROM wrd WHERE length(word) <= $L),
         |subs AS MATERIALIZED (
         |  SELECT piece, sum(wcnt) AS pcnt FROM (
         |    SELECT substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
         |      wcnt
         |    FROM wrd, range(1, 65) t(i), range(1, 4) u(l)
         |    WHERE i + l - 1 <= length(word))
         |  GROUP BY piece),
         |model AS MATERIALIZED (
         |  SELECT piece, pcnt FROM subs WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, pcnt FROM (
         |    SELECT piece, pcnt FROM subs WHERE length(piece) > 1
         |    ORDER BY pcnt DESC, piece ASC LIMIT 20)),
         |tot AS (SELECT sum(pcnt + 1) AS t FROM model),
         |sc AS MATERIALIZED (SELECT piece, ln((pcnt + 1) / t) AS s FROM model, tot),
         |dp0 AS MATERIALIZED (SELECT word, CAST(0 AS DOUBLE) AS f FROM wl),
         |${(1 to L).map(dp).mkString(",\n")},
         |fin AS (
         |  $fins)
         |SELECT f.word, w.wcnt, round(f.f, 4) + 0.0 AS score
         |FROM fin f JOIN wl w ON w.word = f.word""".stripMargin
    },

    // Same model, same ordered fold: doc-level pair counts → corpus MLE
    // probabilities → per-doc list(term ORDER BY bigram) summed
    // left-to-right.
    "q_lm_score" -> s"WITH $lmCtes\n$lmSelect",

    // Model from even doc_ids only; target bigrams left-join the model
    // tables; same CASE backoff, same 1e-10 floor, same ordered fold.
    "q_kn_crossscore" ->
      s"""WITH bgd AS (
         |  SELECT doc_id, unnest(${OracleSql.shinglesSqlN(2)}) AS bg
         |  FROM documents),
         |pt AS (SELECT doc_id, string_split(bg, ' ')[1] AS w1,
         |              string_split(bg, ' ')[2] AS w2 FROM bgd),
         |mdp AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM pt
         |        WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
         |pair AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS c12
         |         FROM mdp GROUP BY 1, 2),
         |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         |               CAST(count(*) AS BIGINT) AS n1v
         |        FROM pair GROUP BY 1),
         |contw AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1w
         |          FROM pair GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM pair),
         |tdp AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM pt
         |        WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT tdp.doc_id, tdp.cnt, tdp.w1, tdp.w2,
         |    pair.c12 IS NULL AS unseen,
         |    greatest(
         |      CASE WHEN uni.c1 IS NULL
         |        THEN coalesce(contw.n1w, 0) / CAST(tot.t AS DOUBLE)
         |        ELSE greatest(CAST(coalesce(pair.c12, 0) AS DOUBLE) - 0.75, 0.0)
         |               / CAST(uni.c1 AS DOUBLE)
         |             + (0.75 * CAST(uni.n1v AS DOUBLE) / CAST(uni.c1 AS DOUBLE))
         |               * (coalesce(contw.n1w, 0) / CAST(tot.t AS DOUBLE))
         |      END, 1e-10) AS p
         |  FROM tdp
         |  LEFT JOIN pair USING (w1, w2)
         |  LEFT JOIN uni USING (w1)
         |  LEFT JOIN contw USING (w2)
         |  CROSS JOIN tot)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         |  round(list_sum(list(cnt * ln(p) ORDER BY w1, w2)) /
         |    CAST(sum(cnt) AS BIGINT), 4) AS avg_klogp,
         |  CAST(sum(CASE WHEN unseen THEN cnt ELSE 0 END) AS BIGINT)
         |    AS n_unseen
         |FROM sc GROUP BY doc_id""".stripMargin,

    // Same pair table; KN statistics as row counts of it grouped each
    // way; same fixed parenthesization, same ordered per-doc fold.
    "q_kn_lm" ->
      s"""WITH bgd AS (
         |  SELECT doc_id, unnest(${OracleSql.shinglesSqlN(2)}) AS bg
         |  FROM documents),
         |pt AS (SELECT doc_id, string_split(bg, ' ')[1] AS w1,
         |              string_split(bg, ' ')[2] AS w2 FROM bgd),
         |dp AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM pt GROUP BY 1, 2, 3),
         |pair AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS c12
         |         FROM dp GROUP BY 1, 2),
         |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         |               CAST(count(*) AS BIGINT) AS n1v
         |        FROM pair GROUP BY 1),
         |contw AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1w
         |          FROM pair GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM pair),
         |pr AS (
         |  SELECT w1, w2,
         |    greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
         |    + (0.75 * CAST(n1v AS DOUBLE) / CAST(c1 AS DOUBLE))
         |      * (CAST(n1w AS DOUBLE) / CAST(t AS DOUBLE)) AS p
         |  FROM pair JOIN uni USING (w1) JOIN contw USING (w2) CROSS JOIN tot),
         |terms AS (
         |  SELECT dp.doc_id, dp.cnt, dp.w1, dp.w2, dp.cnt * ln(pr.p) AS term
         |  FROM dp JOIN pr USING (w1, w2))
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         |  round(list_sum(list(term ORDER BY w1, w2)) /
         |    CAST(sum(cnt) AS BIGINT), 4) AS avg_klogp
         |FROM terms GROUP BY doc_id""".stripMargin,

    // Same LM chain + same langid marker case + per-language
    // quantile_cont terciles; identical strict-> banding.
    "q_ccnet_buckets" ->
      s"""WITH $lmCtes,
         |lm AS ($lmSelect),
         |t AS (
         |  SELECT doc_id, lang,
         |    string_split_regex(trim(lower(text)), '\\s+') AS __toks
         |  FROM documents),
         |ev AS (
         |  SELECT doc_id, lang,
         |${TextFunctions.langMarkers.keys.toSeq.sorted
             .map(l => s"    ${markerSql(l)} AS __n_$l").mkString(",\n")}
         |  FROM t),
         |lg AS (SELECT doc_id, $langCase AS plang FROM ev),
         |sc AS (SELECT lm.doc_id, lg.plang, lm.avg_logp
         |       FROM lm JOIN lg USING (doc_id)),
         |q AS (SELECT plang,
         |        quantile_cont(avg_logp, 1.0/3) AS b1,
         |        quantile_cont(avg_logp, 2.0/3) AS b2
         |      FROM sc GROUP BY 1)
         |SELECT sc.doc_id, sc.plang, sc.avg_logp,
         |  CASE WHEN sc.avg_logp > q.b2 THEN 'head'
         |       WHEN sc.avg_logp > q.b1 THEN 'middle'
         |       ELSE 'tail' END AS band
         |FROM sc JOIN q USING (plang)""".stripMargin,

    // Same tokenization, same exclusive running sum in doc_id order,
    // same floor-div sequence ids.
    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(off // 128 AS BIGINT) AS first_seq,
        |  CAST((off + n_tokens - 1) // 128 AS BIGINT) AS last_seq,
        |  CAST((off + n_tokens - 1) // 128 - off // 128 + 1 AS BIGINT)
        |    AS n_seqs
        |FROM p""".stripMargin,

    // Same hashed buckets (md5-60 mod 1024), same Laplace-smoothed
    // rational probabilities, same bucket-ordered fold.
    "q_dsir_weights" ->
      s"""WITH bgd AS (
         |  SELECT doc_id, unnest(${OracleSql.shinglesSqlN(2)}) AS bg
         |  FROM documents),
         |db AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT) % 1024 AS b,
         |    count(*) AS cnt
         |  FROM bgd GROUP BY 1, 2),
         |raw AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cr FROM db GROUP BY 1),
         |tgtd AS (SELECT doc_id FROM documents
         |         WHERE source IN ('src0','src1','src2','src3','src4')),
         |tgt AS (
         |  SELECT b, CAST(sum(cnt) AS BIGINT) AS ct
         |  FROM db JOIN tgtd USING (doc_id) GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT sum(cr) FROM raw) AS R,
         |    (SELECT coalesce(sum(ct), 0) FROM tgt) AS T),
         |model AS (
         |  SELECT raw.b,
         |    (coalesce(tgt.ct, 0) + 1.0) / (tot.T + 1024.0) AS pt,
         |    (raw.cr + 1.0) / (tot.R + 1024.0) AS pr
         |  FROM raw LEFT JOIN tgt USING (b), tot),
         |terms AS (
         |  SELECT db.doc_id, db.cnt, db.b,
         |    db.cnt * (ln(model.pt) - ln(model.pr)) AS term
         |  FROM db JOIN model USING (b))
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
         |  round(list_sum(list(term ORDER BY b)), 4) + 0.0 AS log_weight
         |FROM terms GROUP BY doc_id""".stripMargin,

    // Same integer milli-unit losses, same 8 EG rounds unrolled as
    // chained CTEs with domain-ORDERED normalizer folds; (1.0 - 0.05)
    // spelled as the subtraction (NOT 0.95 — different double).
    "q_doremi_weights" -> {
      val kSql = "(SELECT count(*) FROM ex)"
      def zSql(r: String) =
        s"(SELECT list_sum(list(w * exp(0.5 * excess) ORDER BY domain)) FROM $r)"
      val rounds = (1 to 8).map { t =>
        val prev = s"r${t - 1}"
        s"""r$t AS (
           |  SELECT domain, n_docs, excess,
           |    (1.0 - 0.05) * (w * exp(0.5 * excess) / ${zSql(prev)})
           |      + 0.05 / $kSql AS w
           |  FROM $prev)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (
         |  SELECT source,
         |    greatest(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END, 1) AS tok,
         |    n_chars
         |  FROM documents WHERE source IS NOT NULL),
         |pd AS (
         |  SELECT source AS domain, count(*) AS n_docs,
         |    sum((1000 * n_chars) // tok) AS loss,
         |    CAST(6000 * count(*) AS BIGINT) AS ref
         |  FROM d GROUP BY 1),
         |ex AS (
         |  SELECT domain, n_docs,
         |    greatest(0.0, CAST(loss - ref AS DOUBLE) / (1000.0 * n_docs))
         |      AS excess
         |  FROM pd),
         |r0 AS (SELECT domain, n_docs, excess, 1.0 / $kSql AS w FROM ex),
         |$rounds
         |SELECT domain, n_docs, round(excess, 6) AS excess,
         |  round(w, 6) AS weight
         |FROM r8""".stripMargin
    },

    // Same planted URLs, same shared-syntax host/domain patterns.
    "q_url_domains" -> {
      val host = graft.text.Urls.hostPattern
      s"""WITH planted AS (
         |  SELECT doc_id, text ||
         |    (CASE WHEN doc_id % 2 = 0 THEN ' see https://sub' ||
         |      CAST(doc_id % 5 AS VARCHAR) || '.example' ||
         |      CAST(doc_id % 20 AS VARCHAR) || '.com/p/' ||
         |      CAST(doc_id AS VARCHAR) ELSE '' END) ||
         |    (CASE WHEN doc_id % 3 = 0 THEN ' via http://Mirror.Example.org/x'
         |      ELSE '' END) AS text
         |  FROM documents),
         |h AS (
         |  SELECT unnest(regexp_extract_all(text, '$host', 1)) AS host
         |  FROM planted),
         |d AS (
         |  SELECT lower(host) AS lhost,
         |    regexp_extract(lower(host), '([a-z0-9-]+\\.[a-z0-9-]+)$$', 1) AS domain
         |  FROM h)
         |SELECT domain, count(*) AS n_urls, count(DISTINCT lhost) AS n_hosts
         |FROM d GROUP BY domain""".stripMargin
    },

    // Same HTML shell, same regex chain (shared java.regex ∩ RE2
    // syntax), same entity order (&amp; last), same collapse+trim.
    "q_html_strip" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title><script type="text/javascript">var x = ' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    ';</script><style>.c{color:red}</style></head><body><!-- note ' ||
        |    CAST(doc_id AS VARCHAR) || ' --><h1>Title &amp; ' ||
        |    CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |    '</p><div class="foot">footer&nbsp;link &lt;here&gt; &#39;q&quot;</div></body></html>'
        |      AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html,
        |              '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |        '(?s)</?[a-zA-Z][^>]*>', ' ', 'g'),
        |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean
        |  FROM w)
        |SELECT doc_id, md5(clean) AS clean_md5,
        |  CAST(length(clean) AS BIGINT) AS clean_len,
        |  CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tokens
        |FROM c""".stripMargin,

    // Same planted decomposed accents + BEL; nfc_normalize is UAX #15
    // NFC, identical bytes to the JVM Normalizer; same control class.
    "q_text_normalize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'nfc ' || (['a','e','o'])[CAST(doc_id % 3 AS INT) + 1] ||
        |    ([chr(769), chr(768), chr(776), chr(771)])[CAST(doc_id % 4 AS INT) + 1] ||
        |    ' mid' || (CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END) ||
        |    ' ' || text AS raw
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(raw, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')
        |      AS noctl
        |  FROM p)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(raw) - length(noctl) AS BIGINT) AS n_ctl,
        |  CAST(length(nfc_normalize(noctl)) AS BIGINT) AS len_nfc,
        |  md5(nfc_normalize(noctl)) AS nfc_md5
        |FROM s""".stripMargin,

    // Same planted links, same capture pattern, same canonicalization
    // chain and registered-domain extraction.
    "q_html_links" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    '<p>intro</p><a href="HTTPS://Link' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.Example.COM:443/a/' || CAST(doc_id % 5 AS VARCHAR) ||
        |    '?utm_source=z">anchor ' || CAST(doc_id % 11 AS VARCHAR) || '</a>' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '<div><a class="x" href="http://other' ||
        |      CAST(doc_id % 4 AS VARCHAR) || '.example.org/p#f">second' ||
        |      chr(10) || 'link</a></div>' ELSE '' END) ||
        |    '<b>not a link</b>' AS html
        |  FROM documents),
        |l AS (
        |  SELECT
        |    unnest(regexp_extract_all(html,
        |      '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a\s*>', 1)) AS href,
        |    unnest(regexp_extract_all(html,
        |      '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a\s*>', 2)) AS anchor
        |  FROM w),
        |s1 AS (SELECT anchor, regexp_replace(href, '(?s)#.*$', '') AS u FROM l),
        |s2 AS (SELECT anchor,
        |  lower(regexp_extract(u, '^([hH][tT][tT][pP][sS]?://[^/?#]+)', 1)) ||
        |  regexp_replace(u, '^([hH][tT][tT][pP][sS]?://[^/?#]+)', '') AS u
        |  FROM s1),
        |s3 AS (SELECT anchor,
        |  regexp_replace(
        |    regexp_replace(u, '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
        |    '^(http://[^/:?#]+):80([/?#]|$)', '\1\2') AS u
        |  FROM s2),
        |s4 AS (SELECT anchor,
        |  regexp_replace(u, '([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g')
        |    AS u
        |  FROM s3),
        |c AS (SELECT anchor,
        |  regexp_replace(regexp_replace(
        |    regexp_replace(u, '&&+', '&', 'g'), '\?&', '?'), '[?&]$', '')
        |    AS canon
        |  FROM s4),
        |d AS (SELECT canon, anchor,
        |  regexp_extract(
        |    lower(regexp_extract(canon,
        |      'https?://([a-zA-Z0-9-]+(?:\.[a-zA-Z0-9-]+)+)', 1)),
        |    '([a-z0-9-]+\.[a-z0-9-]+)$', 1) AS domain
        |  FROM c)
        |SELECT domain, count(*) AS n_links,
        |  count(DISTINCT canon) AS n_targets,
        |  count(DISTINCT anchor) AS n_anchors
        |FROM d GROUP BY domain""".stripMargin,

    // Same planted URLs, same canonicalization chain (RE2 replacement
    // refs are \1 where java.regex uses $1 — same semantics).
    "q_url_canonical" ->
      """WITH u AS (
        |  SELECT unnest(CASE WHEN doc_id % 2 = 0 THEN [
        |    'HTTPS://Example' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.COM:443/Path/' || CAST(doc_id % 5 AS VARCHAR) ||
        |      '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR) ||
        |      '&utm_campaign=c#frag' || CAST(doc_id % 9 AS VARCHAR),
        |    'http://Mirror.example' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.com:80/p?gclid=abc' || CAST(doc_id % 3 AS VARCHAR)]
        |  ELSE [
        |    'HTTPS://Example' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.COM:443/Path/' || CAST(doc_id % 5 AS VARCHAR) ||
        |      '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR) ||
        |      '&utm_campaign=c#frag' || CAST(doc_id % 9 AS VARCHAR)]
        |  END) AS url
        |  FROM documents),
        |s1 AS (SELECT regexp_replace(url, '(?s)#.*$', '') AS u FROM u),
        |s2 AS (SELECT
        |  lower(regexp_extract(u, '^([hH][tT][tT][pP][sS]?://[^/?#]+)', 1)) ||
        |  regexp_replace(u, '^([hH][tT][tT][pP][sS]?://[^/?#]+)', '') AS u
        |  FROM s1),
        |s3 AS (SELECT
        |  regexp_replace(
        |    regexp_replace(u, '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
        |    '^(http://[^/:?#]+):80([/?#]|$)', '\1\2') AS u
        |  FROM s2),
        |s4 AS (SELECT
        |  regexp_replace(u, '([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g')
        |    AS u
        |  FROM s3),
        |c AS (SELECT
        |  regexp_replace(regexp_replace(
        |    regexp_replace(u, '&&+', '&', 'g'), '\?&', '?'), '[?&]$', '')
        |    AS canon_url
        |  FROM s4)
        |SELECT canon_url, count(*) AS n FROM c GROUP BY canon_url""".stripMargin,

    // Same planted PII, same shared-syntax patterns (java.util.regex and
    // RE2 agree on them — see text.Redact), same redaction order.
    "q_pii_redact" -> {
      val em = graft.text.Redact.emailPattern
      val ip = graft.text.Redact.ipv4Pattern
      val ph = graft.text.Redact.phonePattern
      s"""WITH planted AS (
         |  SELECT doc_id, text ||
         |    (CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END) ||
         |    (CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' ||
         |      CAST(doc_id % 200 AS VARCHAR) || '.77' ELSE '' END) ||
         |    (CASE WHEN doc_id % 7 = 0 THEN ' call 555-' ||
         |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END)
         |    AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g'))
         |    AS redacted_md5
         |FROM planted""".stripMargin
    },

    // Mirrors HashedLinear exactly: same normalization/tokenization, same
    // md5-60bit feature hash mod 4096, same Knuth-mix synthetic weights,
    // BIGINT milli-unit sums (order-independent — no float dot product).
    "q_quality_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 4096 AS feature
        |  FROM toks WHERE t <> ''),
        |w AS (SELECT doc_id, (feature * 2654435761) % 2001 - 1000 AS wm FROM f)
        |SELECT doc_id, CAST(sum(wm) AS BIGINT) AS score_milli,
        |  CAST(sum(wm) AS BIGINT) > 0 AS keep
        |FROM w GROUP BY doc_id""".stripMargin,

    // Bitmaps are the plan, not the semantics: naive distinct-pair count.
    "q_bitmap_cooccur" ->
      s"""WITH m AS (
         |  SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(${OracleSql.toksSql}) AS term
         |    FROM documents)
         |  WHERE term IN ('hash', 'scan', 'table', 'stream', 'vector',
         |    'customer')),
         |n AS (SELECT term, count(*) AS n FROM m GROUP BY 1),
         |p AS (
         |  SELECT a.term AS term_a, b.term AS term_b,
         |    CAST(count(*) AS BIGINT) AS co_docs
         |  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.term < b.term
         |  GROUP BY 1, 2)
         |SELECT term_a, term_b, co_docs,
         |  CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b
         |FROM p JOIN n x ON term_a = x.term JOIN n y ON term_b = y.term""".stripMargin,

    // Same md5 block coins, same rank numbering, same piece ordering —
    // string_agg ignores the NULL pieces exactly as collect_list does.
    "q_span_corrupt" ->
      s"""WITH t AS (SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
         |e AS (
         |  SELECT doc_id, unnest(toks) AS tok,
         |    generate_subscripts(toks, 1) - 1 AS pos
         |  FROM t),
         |b AS (
         |  SELECT doc_id, pos, tok, pos // 5 AS blk, pos % 5 AS ib
         |  FROM e WHERE tok <> ''),
         |sel AS (
         |  SELECT DISTINCT doc_id, blk FROM b
         |  WHERE CAST(('0x' || substr(md5(
         |      CAST(doc_id AS VARCHAR) || '_' || CAST(blk AS VARCHAR)),
         |      1, 15)) AS BIGINT) % 10 < 3),
         |rk AS (
         |  SELECT doc_id, blk,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY blk) - 1
         |      AS BIGINT) AS k
         |  FROM sel),
         |m AS (
         |  SELECT b.doc_id, b.pos, b.tok, b.ib, rk.k,
         |    (rk.k IS NOT NULL AND b.ib < 3) AS masked
         |  FROM b LEFT JOIN rk ON b.doc_id = rk.doc_id AND b.blk = rk.blk),
         |agg AS (
         |  SELECT doc_id,
         |    string_agg(CASE WHEN NOT masked THEN tok
         |      WHEN ib = 0 THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
         |      END, ' ' ORDER BY pos) AS input_text,
         |    nullif(string_agg(CASE WHEN masked THEN
         |        CASE WHEN ib = 0
         |          THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || tok
         |          ELSE tok END
         |      END, ' ' ORDER BY k, ib), '') AS target_text
         |  FROM m GROUP BY doc_id)
         |SELECT * FROM agg""".stripMargin,

    // Occurrences recomputed by direct windowed token scan — the postings
    // intersection is the engine's plan, not the semantics.
    "q_phrase_search" -> {
      def arm(phrase: String): String = {
        val ts = phrase.split(" ")
        val cond = ts.zipWithIndex
          .map { case (t, i) => s"toks[i + $i] = '$t'" }.mkString(" AND ")
        s"""SELECT '$phrase' AS phrase, doc_id,
           |  CAST(len(list_filter(range(1, len(toks) - ${ts.length - 2}),
           |    i -> $cond)) AS BIGINT) AS n_hits
           |FROM t""".stripMargin
      }
      s"""WITH t AS (SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
         |hits AS (
         |${Seq("slow hash batch", "part filter scan", "row column sort")
           .map(arm).mkString("\nUNION ALL\n")})
         |SELECT * FROM hits WHERE n_hits > 0""".stripMargin
    },

    // Struct-sorted posting lists: (doc_id, tf) struct order == doc order
    // (doc unique per term), so the rendered list matches Spark's
    // sort_array byte for byte.
    "q_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM toks WHERE term <> '' GROUP BY doc_id, term)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(tf) AS BIGINT) AS cf,
        |  array_to_string(list_transform(
        |    list_sort(list({'d': doc_id, 'tf': tf})),
        |    e -> CAST(e.d AS VARCHAR) || ':' || CAST(e.tf AS VARCHAR)), ',')
        |    AS postings
        |FROM tf GROUP BY term
        |HAVING count(*) BETWEEN 2 AND 400""".stripMargin)
}

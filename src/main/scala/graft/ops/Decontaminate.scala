package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination — flag training documents that share any word
  * n-gram with an evaluation/benchmark corpus, so eval data can be stripped
  * from a training set BEFORE it leaks into a model (the standard n-gram
  * overlap test used by LLM training pipelines).
  *
  * Formulation: both sides are reduced to their DISTINCT word n-grams (one
  * codegen'd [[graft.expr.WordShingles]] eval per document), and the overlap
  * is an equi-join on the n-gram string. The shuffle key is the n-gram, so
  * fan-out is bounded by n-gram document frequency — document text never
  * crosses the wire, and there is no pairwise comparison anywhere.
  *
  * 100 TB shape: the eval corpus is small (benchmarks are MBs, training sets
  * are TBs), so the semi-join's eval side broadcasts; for eval sets past the
  * broadcast threshold, `bloomPrefilter = true` builds a Bloom filter over
  * the eval n-gram hashes (a distributed aggregate — the only driver-side
  * object is the filter's bit array) and prunes the train-side explode with
  * a codegen'd might_contain BEFORE the join. Bloom filters have no false
  * negatives, so the prefilter only discards rows the join would discard —
  * the result stays EXACT (false positives are re-checked by the join), and
  * the shuffle shrinks from every-train-ngram to candidate-ngrams-only.
  */
object Decontaminate {

  /** Per-document contamination report for `train`: every `train` row with
    * `n_eval_ngrams` = how many distinct eval n-grams the document contains
    * and `contaminated` = n_eval_ngrams > 0. Callers strip with
    * `.filter(!col("contaminated"))` or audit the hit counts.
    *
    * @param estEvalNgrams Bloom sizing when `bloomPrefilter` is on: the
    *   expected count of distinct eval n-grams (overestimate is safe — only
    *   memory; underestimate only raises the false-positive rate, never
    *   breaks exactness).
    */
  def flagContaminated(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      bloomPrefilter: Boolean = false,
      estEvalNgrams: Long = 4L << 20): DataFrame = {
    val evalNgrams = eval
      .select(explode(Dedup.shingles(col(textCol), n)).as("__sh"))
      .distinct()
    // Distinct within each train doc, so the hit count is "distinct eval
    // n-grams present", not occurrence count — insensitive to repetition.
    val trainNgrams = train.select(col(idCol),
      explode(graft.expr.WordShingles.shingles(col(textCol), n, distinct = true))
        .as("__sh"))

    val probed =
      if (bloomPrefilter) bloomFilterRows(trainNgrams, evalNgrams, col("__sh"), estEvalNgrams)
      else trainNgrams

    val hits = probed
      .join(evalNgrams, Seq("__sh"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_eval_ngrams"))

    train
      .join(hits, Seq(idCol), "left")
      .withColumn("n_eval_ngrams", coalesce(col("n_eval_ngrams"), lit(0L)))
      .withColumn("contaminated", col("n_eval_ngrams") > 0)
  }

  /** Prune `rows` to those whose `keyCol` might be in `filterSide`'s key set,
    * via a Bloom filter over xxhash64 of the keys. No false negatives: the
    * result is a superset of the exact semi-join, suitable as a prefilter
    * in front of it. Exposed for reuse (any huge-fact vs small-ish-key-set
    * semi-join: decontamination, dead-letter lookups, incremental dedup).
    */
  def bloomFilterRows(
      rows: DataFrame, filterSide: DataFrame, keyCol: Column,
      estItems: Long): DataFrame = {
    // ~8 bits/item ≈ 2% fpp, capped at 2^27 bits (16 MiB) — broadcast-safe.
    val numBits = math.min(8L * math.max(estItems, 1L), 1L << 27)
    // Built via DataFrameStatFunctions.bloomFilter (a distributed
    // treeAggregate honoring OUR sizing exactly), NOT BloomFilterAggregate
    // — that expression silently Math.min's its size against the
    // runtime-filter session caps (4M items / 2^26 bits by default), and
    // temporarily raising the caps would mutate session state shared with
    // concurrent queries. The probe side still uses the codegen'd
    // might_contain over the same serialized filter format.
    val keyed = filterSide.select(xxhash64(keyCol).as("__h"))
    // Guard first: stat.bloomFilter NPEs on an empty input (its internal
    // aggregate yields null bytes). Nothing can match an empty key set.
    if (keyed.isEmpty) rows.limit(0)
    else {
      val bf = keyed.stat.bloomFilter("__h", math.max(estItems, 1L), numBits)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      rows.filter(GraftColumnBridge.column(BloomFilterMightContain(
        Literal(bos.toByteArray, BinaryType),
        GraftColumnBridge.expression(xxhash64(keyCol)))))
    }
  }

  /** FUZZY decontamination: flag training documents that are MinHash-LSH
    * near-duplicates of any eval document, not just exact n-gram sharers —
    * the companion to [[flagContaminated]] for paraphrased/reformatted
    * benchmark leakage (eval questions quoted with different whitespace,
    * translated templates, boilerplate-wrapped copies), which the exact
    * n-gram test misses once any token inside every shared n-gram changes.
    *
    * Per `train` row: `n_eval_neardups` = eval docs whose estimated Jaccard
    * (signature agreement) reaches `minJaccard`, `max_jaccard` = the
    * strongest such estimate (0.0 when none), `fuzzy_contaminated`.
    *
    * Scale shape: inherits [[Dedup.md5MinHashCandidatesAgainst]]'s banded
    * bucket join — candidates are generated per (band, bucket), so the
    * train side never all-pairs against eval; the flag join back to
    * `train` is id-keyed. The md5 signature family keeps oracle parity;
    * production volumes can swap in the xxhash64 signatures and reuse the
    * same thresholding on their candidate pairs.
    */
  def flagFuzzy(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val hits = Dedup.md5MinHashCandidatesAgainst(
        batch = eval, corpus = train, idCol, textCol,
        shingleSize, numHashes, bands)
      .filter(col("jaccard_est") >= minJaccard)
      .groupBy(col("id_corpus").as(idCol))
      .agg(count(lit(1)).as("n_eval_neardups"),
        max(col("jaccard_est")).as("max_jaccard"))
    train
      .join(hits, Seq(idCol), "left")
      .withColumn("n_eval_neardups", coalesce(col("n_eval_neardups"), lit(0L)))
      .withColumn("max_jaccard", coalesce(col("max_jaccard"), lit(0.0)))
      .withColumn("fuzzy_contaminated", col("n_eval_neardups") > 0)
  }
}

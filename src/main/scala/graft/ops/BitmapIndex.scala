package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bitmap (bitset) index over a dense ordinal space — the roaring-bitmap
  * idea (Chambi et al., 2016) in relational form: a key's membership set
  * is stored as 64-bit WORDS, (key, word, bits), built with a bit_or
  * aggregation. Set algebra then runs word-aligned: intersection is
  * `a & b`, cardinality is `sum(bit_count(...))` — 64 memberships per
  * row of shuffle, versus one row per membership for an id-list layout.
  *
  * bit_or makes duplicate memberships free (no pre-distinct shuffle),
  * and the build is one partial-agg'd groupBy: (key, word) rows combine
  * map-side. Pair queries join bitmaps on `word`, so the exchange
  * carries each key's N/64 words once per compared pair — the bitmap IS
  * the pre-aggregation. Ordinals come from [[Ordinals.assign]] when ids
  * are not already dense.
  */
object BitmapIndex {

  /** (key, word, bits) bitmap words from (key, ordinal) memberships.
    * Ordinals must be non-negative; duplicates are harmless.
    */
  def build(memberships: DataFrame, keyCol: String,
      ordCol: String): DataFrame =
    memberships.select(col(keyCol).as("key"),
        shiftright(col(ordCol).cast("long"), 6).as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod($ordCol, 64) AS INT))")
          .as("__b"))
      .groupBy(col("key"), col("word"))
      .agg(expr("bit_or(__b)").as("bits"))

  /** Per-key set cardinality: Σ popcount(words). */
  def cardinality(bitmaps: DataFrame): DataFrame =
    bitmaps.groupBy(col("key"))
      .agg(sum(bit_count(col("bits"))).as("card"))

  /** All key-pair intersection cardinalities (key_a < key_b): word-aligned
    * AND + popcount. Pairs sharing no member are absent.
    *
    * This is the ALL-PAIRS form — per word it generates K²/2 compare rows
    * for K keys, which is the right shape at dashboard-sized key counts
    * (tens of terms) and a quadratic pair generator beyond that. At high
    * key cardinality use the candidate-blocked overload, which bounds pair
    * generation to an explicit candidate set.
    */
  def intersectCounts(bitmaps: DataFrame): DataFrame =
    scoreWordJoin(
      bitmaps.select(col("key").as("key_a"), col("word"),
          col("bits").as("__ba"))
        .join(bitmaps.select(col("key").as("key_b"), col("word"),
          col("bits").as("__bb")), Seq("word"))
        .filter(col("key_a") < col("key_b")))

  /** Candidate-blocked intersection cardinalities: scores ONLY the pairs in
    * `candidates` (columns (`key_a`, `key_b`), canonicalized internally so
    * either orientation works; duplicates are deduped). Pair generation is
    * bounded by |candidates| — word rows are joined per candidate pair, so
    * the exchange carries each key's N/64 words once per candidate it
    * appears in, never K²/word. This is the 100-TB shape: the candidate
    * set comes from a cheap blocker (co-occurrence prefilter, LSH band,
    * a top-K term list), and the bitmap join does the exact counting.
    *
    * Output contract matches [[intersectCounts]]: (key_a < key_b, co_card),
    * pairs with an empty intersection absent.
    */
  def intersectCounts(bitmaps: DataFrame, candidates: DataFrame): DataFrame = {
    val canon = candidates
      .select(least(col("key_a"), col("key_b")).as("key_a"),
        greatest(col("key_a"), col("key_b")).as("key_b"))
      .filter(col("key_a") < col("key_b"))
      .distinct()
    scoreWordJoin(
      canon
        .join(bitmaps.select(col("key").as("key_a"), col("word"),
          col("bits").as("__ba")), Seq("key_a"))
        .join(bitmaps.select(col("key").as("key_b"), col("word"),
          col("bits").as("__bb")), Seq("key_b", "word")))
  }

  /** Shared scoring tail: (key_a, key_b, __ba, __bb) word rows →
    * popcount-of-AND totals. One partial-agg'd groupBy — word rows combine
    * map-side before the (key_a, key_b) exchange.
    */
  private def scoreWordJoin(pairWords: DataFrame): DataFrame =
    pairWords
      .groupBy(col("key_a"), col("key_b"))
      .agg(sum(bit_count(col("__ba").bitwiseAND(col("__bb")))).as("co_card"))
      .filter(col("co_card") > 0)
}

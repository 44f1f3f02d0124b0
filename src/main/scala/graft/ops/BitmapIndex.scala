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
    */
  def intersectCounts(bitmaps: DataFrame): DataFrame = {
    val a = bitmaps.select(col("key").as("key_a"), col("word"),
      col("bits").as("__ba"))
    val b = bitmaps.select(col("key").as("key_b"), col("word"),
      col("bits").as("__bb"))
    a.join(b, Seq("word"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(sum(bit_count(col("__ba").bitwiseAND(col("__bb")))).as("co_card"))
      .filter(col("co_card") > 0)
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): hash every character k-gram, then keep the
  * RIGHTMOST MINIMUM hash of each sliding window of `w` grams. The
  * guarantee that makes it the local-overlap dedup signal (MinHash can't
  * give it): any shared substring of length ≥ w+k−1 between two documents
  * shares at least one fingerprint, at an expected density of only
  * 2/(w+1) selected positions.
  *
  * Determinism: the rightmost-min selection is encoded into ONE sortable
  * BIGINT per gram — `(md5 mod 2^40)·2^21 + (2^21−1−pos)` — so a plain
  * windowed `min` picks (smallest hash, then rightmost position) with no
  * tie logic, identically on every engine (`q_winnowing` gates it).
  *
  * Scale shape: the char-gram explode is the honest 1:len fan-out
  * winnowing is defined on; it flows straight into ONE doc-keyed shuffle
  * where the per-doc sort feeds both the window min and the distinct.
  * Fingerprint sets (the output) are ~2/(w+1) of gram count — the
  * downstream inverted-index/pair-join operates on the small side.
  * Documents are capped at 2^21 chars by the position encoding (split
  * longer ones upstream).
  */
object Winnowing {

  /** Per-gram fingerprint keys with positions; internal building block. */
  private def gramKeys(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val norm = Dedup.normalizeText(col(textCol))
    val grams = transform(sequence(lit(0), length(norm) - k),
      i => substring(norm, i + 1, lit(k)))
    docs
      .filter(length(norm) >= k)
      .select(col(idCol).as("doc_id"), posexplode(grams).as(Seq("pos", "__g")))
      .select(col("doc_id"), col("pos"),
        (pmod(Dedup.md5Hash60(col("__g")), lit(1L << 40)) * lit(1L << 21) +
          (lit((1L << 21) - 1) - col("pos"))).as("__key"))
  }

  private def substring(c: Column, pos: Column, len: Column): Column =
    c.substr(pos, len)

  /** Distinct winnowing fingerprints per document: (doc_id, fp) where
    * `fp` encodes (hash, rightmost position). `w` is the window size in
    * grams, `k` the gram length in chars.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 1)
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    gramKeys(docs, idCol, textCol, k)
      .withColumn("__fp", min(col("__key")).over(win))
      .filter(col("pos") >= w - 1) // only full windows select
      // The POSITION bits exist only to make the min pick the rightmost
      // tie; the fingerprint identity is the HASH — strip the low 21 bits
      // or the same shared substring at two offsets would never match.
      .select(col("doc_id"), shiftright(col("__fp"), 21).as("fp"))
      .distinct()
  }

  /** Fingerprint density report: (doc_id, n_grams, n_fingerprints) —
    * expect n_fingerprints ≈ 2·n_grams/(w+1).
    */
  def profile(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    // n_grams is CLOSED-FORM from the normalized length (len − k + 1) —
    // deriving it from the explode would run the whole gram+md5 pipeline
    // a second time for a count the scan already knows.
    val norm = Dedup.normalizeText(col(textCol))
    val grams = docs.filter(length(norm) >= k)
      .select(col(idCol).as("doc_id"),
        (length(norm) - k + 1).cast("long").as("n_grams"))
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints"))
    grams.join(fps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fingerprints"), lit(0L)).as("n_fingerprints"))
  }

  /** Candidate overlap pairs: documents sharing ≥ `minShared` fingerprints
    * — shuffle keyed on the fingerprint (bucketed, never all-pairs), with
    * a frequency cap dropping degenerate boilerplate fingerprints.
    */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Long = 2L,
      maxDf: Long = 1000L): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    val pruned = fps.join(rare.select("fp"), "fp")
    pruned.select(col("fp"), col("doc_id").as("id_a"))
      .join(pruned.select(col("fp"), col("doc_id").as("id_b")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}

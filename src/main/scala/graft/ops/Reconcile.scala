package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: row-level diff of two versions of a keyed
  * table — the change-data-capture / data-validation primitive (did the
  * rewrite lose rows? what changed between yesterday's and today's
  * gold?).
  *
  * Scale shape: each side collapses to (key, value-hash) in a map-only
  * projection, so the full-outer join shuffles two slim columns instead
  * of whole rows. Value canonicalization is INJECTIVE: each cell is
  * tagged (null vs value — so NULL never collides with any string) and
  * md5'd individually, and the row hash digests the concatenation of
  * those fixed-length digests — no column-boundary aliasing, no
  * separator-in-the-data aliasing. Java's shortest-roundtrip double
  * formatting is injective, so hash equality == value equality barring
  * md5 collision.
  */
object Reconcile {

  /** One row per differing key: `change_type` ∈ added (only in `b`),
    * removed (only in `a`), changed (both, differing non-key values).
    * Schemas must match; compare columns = all non-key columns.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"schema mismatch: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val valCols = a.columns.filterNot(keys.contains)
    // Per-cell tag ("n"/"v" disambiguates NULL from every string) then
    // per-cell md5: fixed-length digests concatenate without boundary
    // ambiguity, so the row hash is injective on the value tuple.
    def cell(c: String) = md5(
      when(col(c).isNull, lit("n")).otherwise(concat(lit("v"), col(c).cast("string"))))
    // All-key schemas degenerate to pure presence diffing.
    val rowHash =
      if (valCols.isEmpty) lit("") else md5(concat(valCols.map(cell): _*))
    def hashed(df: DataFrame, tag: String) = df.select(
      keys.map(col) :+ rowHash.as(s"__h_$tag"): _*)
    hashed(a, "a").join(hashed(b, "b"), keys, "full_outer")
      .withColumn("change_type",
        when(col("__h_a").isNull, "added")
          .when(col("__h_b").isNull, "removed")
          .when(col("__h_a") =!= col("__h_b"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}

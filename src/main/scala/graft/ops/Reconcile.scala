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
  * of whole rows. Value canonicalization is null-sentinel'd string
  * concat → md5; any engine re-deriving the comparison row-by-row gets
  * the same verdicts (Java's shortest-roundtrip double formatting is
  * injective, so hash equality == value equality barring md5 collision).
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
    def hashed(df: DataFrame, tag: String) = df.select(
      keys.map(col) :+
        md5(concat_ws("\u0001",
          valCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(s"__h_$tag"): _*)
    hashed(a, "a").join(hashed(b, "b"), keys, "full_outer")
      .withColumn("change_type",
        when(col("__h_a").isNull, "added")
          .when(col("__h_b").isNull, "removed")
          .when(col("__h_a") =!= col("__h_b"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}

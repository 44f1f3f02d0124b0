package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) storage for exchange-free joins — the
  * 100 TB co-location strategy: write both sides of a recurring join
  * `bucketBy(n, key)` + `sortBy(key)`, and every later equi-join on
  * that key plans WITHOUT a shuffle on either side (and without a sort
  * when the bucket sort matches) — the join cost that matters at scale
  * is paid ONCE at write time instead of on every query.
  *
  * What Spark requires for the exchange to disappear, encoded here so
  * callers can't half-configure it:
  *   - both sides bucketed on the JOIN KEY with compatible bucket
  *     counts (equal, or one a multiple of the other);
  *   - `spark.sql.sources.bucketing.enabled` (default true) and the
  *     table read through the catalog (`spark.table`), not raw parquet
  *     paths — bucket metadata lives in the catalog;
  *   - one FILE per bucket (enforced by repartitioning on the key
  *     before the write) — otherwise Spark may disable bucketed reads
  *     or scan multiple files per bucket task.
  *
  * The plan-shape contract (no Exchange under the SortMergeJoin when
  * both sides are bucketed; one Exchange when only one side is) is
  * asserted in BucketedJoinSpec — the same "the physical plan is part
  * of the contract" stance as PlanShapeSpec.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed+sorted on `key`, one file
    * per bucket.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(buckets, df(key))
      .write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table through the catalog (bucket metadata only
    * flows this way — a raw parquet read loses it).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

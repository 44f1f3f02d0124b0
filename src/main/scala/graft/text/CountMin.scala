package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Count-Min sketch (Cormode & Muthukrishnan, 2005), Spark-native: the
  * sketch is a BOUNDED d×w AGGREGATE TABLE — (depth, bucket) → count —
  * not opaque UDAF state. That reframing buys everything the classic
  * array form has, from the engine's own machinery: map-side combine
  * builds partial sketches per task, the shuffle carries ≤ d·w rows per
  * partition, `merge` is a union+sum (CMS merge IS addition), and point
  * estimates are a bucket join + min. d·w rows (4×1024 default) is
  * broadcast-sized regardless of stream length — the whole point of the
  * sketch.
  *
  * Hashes are md5-derived (seeded per depth), so any engine reproduces
  * the sketch bit-for-bit — `q_count_min` rebuilds it in DuckDB and
  * checks estimates exactly, plus the one-sided guarantee est ≥ exact
  * that Count-Min promises unconditionally.
  */
object CountMin {

  private def bucket(item: Column, depth: Int, width: Int): Column =
    pmod(Dedup.md5Hash60(concat(lit(s"cm${depth}_"), item)), lit(width.toLong))

  /** Build the sketch table: (depth, bucket, cnt), ≤ d·w rows total. */
  def build(items: DataFrame, itemCol: String, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2)
    val rows = items.select(
      posexplode(array((0 until d).map(i =>
        bucket(col(itemCol), i, w)): _*)).as(Seq("depth", "bucket")))
    rows.groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** CMS merge is bucket-wise addition. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))

  /** Equi-join cardinality estimate from two sketches over the SAME
    * (d, w, seed) family: per depth, the inner product Σ_b cntA·cntB
    * overestimates |A ⋈ B| (collisions only add); min over depths
    * tightens it — the classic sketch-based join-size estimator the
    * optimizer altitude uses before committing to a join order. O(d·w)
    * work on two broadcast-sized tables; the relations themselves are
    * never touched.
    */
  def joinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame = {
    a.select(col("depth"), col("bucket"), col("cnt").as("__ca"))
      .join(b.select(col("depth"), col("bucket"), col("cnt").as("__cb")),
        Seq("depth", "bucket"))
      .groupBy("depth").agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .agg(min(col("__ip")).as("join_size_est"))
  }

  /** Point estimates for `probes(itemCol)`: min over depths of the
    * probed bucket counts (0 when a bucket was never touched).
    */
  def estimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val probed = probes.select(col(itemCol).as("item"))
      .distinct()
      .select(col("item"), posexplode(array((0 until d).map(i =>
        bucket(col("item"), i, w)): _*)).as(Seq("depth", "bucket")))
    probed.join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}

package graft.ml

import graft.ops.Ordinals
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation for record linkage
  * (Hernández & Stolfo, SIGMOD 1995): sort the records on a fuzzy key,
  * then pair every record with its `w` successors in the sort order.
  * Where equi-blocking misses pairs whose blocking key disagrees by one
  * typo, the sorted neighborhood catches anything that lands NEARBY in
  * the sort — and multiple passes with different sort keys (forward
  * name, reversed name, zip+street, …) union their windows, the classic
  * multi-pass variant.
  *
  * Scale shape: the global sort order comes from [[graft.ops.Ordinals]]
  * (range-tiled local row_numbers + broadcast offsets — never a
  * single-partition window), and the "pair with the next w" step is an
  * EQUI-join on `ordinal + offset` after exploding offsets 1..w — no
  * range-join, no theta-join, w·n pairs by construction. Candidate
  * volume is linear in the table for fixed w, the property that makes
  * SNM usable where all-pairs is not; the pair table then feeds
  * [[FellegiSunter.emTrain]] like any blocked pairs.
  */
object Blocking {

  /** One sorted-neighborhood pass. Returns (id_a, id_b, w_dist) with
    * id_a/id_b the `idCol` values of records `w_dist` apart (1 ≤ w_dist
    * ≤ w) in (`sortKey`, id) order — the id tiebreak totalizes the
    * order, so ties are deterministic.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortKey: Column,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val ord = Ordinals.assign(
      df.select(col(idCol).as("__id"), sortKey.as("__key")),
      Seq(col("__key").asc, col("__id").asc))
      .select(col("__id"), col("ordinal"))
    val probes = ord.select(col("__id"), col("ordinal"))
      .withColumn("__off", explode(array((1 to w).map(lit): _*)))
      .select(col("__id").as("id_a"),
        (col("ordinal") + col("__off")).as("__target"),
        col("__off").as("w_dist"))
    probes.join(ord.select(col("__id").as("id_b"),
        col("ordinal").as("__target")), "__target")
      .select(col("id_a"), col("id_b"), col("w_dist"))
  }

  /** Multi-pass sorted neighborhood: union of one pass per key, with a
    * pair kept once at its SMALLEST window distance across passes
    * (unordered pair key — pass 2 may see (b, a) where pass 1 saw
    * (a, b)). Returns (id_a, id_b, w_dist, n_passes) with id_a < id_b.
    */
  def multiPass(df: DataFrame, idCol: String, sortKeys: Seq[Column],
      w: Int): DataFrame = {
    require(sortKeys.nonEmpty, "need at least one sort key")
    sortKeys.map(k => sortedNeighborhood(df, idCol, k, w))
      .reduce(_ unionByName _)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("w_dist"))
      .groupBy("id_a", "id_b")
      .agg(min(col("w_dist")).as("w_dist"), count(lit(1)).as("n_passes"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record survivorship: collapse an entity's conflicting source
  * rows into one record by taking, PER FIELD, the latest non-null value —
  * the merge step after entity resolution ([[FuzzyJoin]] finds the
  * matches, [[Dedup.connectedComponents]] groups them, this writes the
  * survivor). "Latest" is a caller-supplied total order (recency +
  * unique tiebreak), so two engines — and two runs — always crown the
  * same value even when sources tie on the timestamp.
  *
  * Shape: ONE groupBy with a `max_by` per field, each ignoring rows where
  * that field is null (`when` puts a NULL ordering on them, and max_by
  * skips null orderings) — partial-aggregated, one shuffle of one slim
  * row per (entity, field-width), no windows, no self-joins.
  */
object Survivorship {

  /** One row per `keyCol`: every field in `fields` resolved to its latest
    * non-null value by `ordCol` (a numeric total order — encode
    * (ts, source-id) into one BIGINT upstream), plus `n_sources`.
    * Entities whose field never appears non-null keep NULL.
    */
  def goldenRecord(df: DataFrame, keyCol: String, ordCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty)
    val aggs = fields.map { f =>
      max_by(col(f), when(col(f).isNotNull, col(ordCol))).as(f)
    } :+ count(lit(1)).as("n_sources")
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}

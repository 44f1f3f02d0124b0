package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

/** Binned range (interval) join — points matched to containing intervals.
  *
  * The naive formulation `p JOIN i ON t BETWEEN s AND e` has no equi-key,
  * so Spark plans a BroadcastNestedLoopJoin: every (point, interval) pair
  * is compared — O(|P|·|I|), a non-starter when both sides are large (the
  * reference's exclusion windows stay broadcast-small, but a training-data
  * pipeline joining events to crawl windows or session spans does not).
  *
  * The bin trick makes it an equi-join: quantize the axis into fixed-width
  * bins, explode each interval into the bins it covers, join point-bin to
  * interval-bin (hash shuffle — AQE, broadcast-if-small, and skew handling
  * all apply), then re-check the exact predicate. Work is
  * O(|P| + Σ interval_width/bin + candidates): fan-out is bounded by
  * interval width over bin width, and candidate pairs by how many intervals
  * genuinely overlap a bin — the data's answer density, not |P|·|I|.
  *
  * Pick `binWidth` near the TYPICAL interval width: much smaller multiplies
  * the interval fan-out (width/bin copies per interval); much larger packs
  * unrelated points and intervals into the same bin and re-inflates the
  * candidate set toward the nested-loop cost.
  *
  * Axis columns may be numeric (binWidth in their own unit), timestamps
  * (binWidth in seconds) or dates (binWidth in days). The exact match is
  * evaluated on the ORIGINAL columns — binning only prunes candidates, so
  * sub-bin precision (e.g. timestamp millis with 1-day bins) is never lost.
  * Bounds are inclusive on both ends.
  */
object RangeJoin {

  /** All columns of `points` then all columns of `intervals` (names must be
    * disjoint), one output row per (point, containing interval) pair.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"point/interval column names must be disjoint: $overlap")

    // ANSI mode forbids timestamp→numeric casts; map each axis type to its
    // natural long scale explicitly (timestamps: epoch seconds, dates: epoch
    // days, numerics: as-is). binWidth is in that unit.
    def bin(df: DataFrame, name: String): Column = {
      val axis = df.schema(name).dataType match {
        case TimestampType => unix_seconds(col(name))
        // NTZ values are wall-clock; the session is pinned UTC, so routing
        // through TimestampType is value-preserving.
        case TimestampNTZType => unix_seconds(col(name).cast(TimestampType))
        case DateType => unix_date(col(name)).cast("long")
        case _: NumericType => col(name).cast("long")
        case t => sys.error(s"unsupported range-join axis type $t for '$name'")
      }
      floor(axis / binWidth).cast("long")
    }

    val pt = points.withColumn("__bin", bin(points, pointCol))
    val iv = intervals
      // Degenerate intervals (end < start) match nothing; guard the explode.
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bin",
        explode(sequence(bin(intervals, startCol), bin(intervals, endCol))))
    pt.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join via the same bin trick — one output
    * row per (left, right) pair with `aStart <= bEnd && bStart <= aEnd`
    * (inclusive-touch counts). Both sides explode to covered bins; a
    * genuinely overlapping pair shares ≥ 1 bin, and duplicate multi-bin
    * hits collapse by assigning each candidate pair to ONE arbitration
    * bin — the bin of the overlap's left edge (`greatest(starts)`) —
    * instead of a distinct-on-pair shuffle: the dedup is a FILTER on the
    * already-joined row, so no second exchange and nothing wide moves.
    * Optional `keyCols` (equal names on both sides) turn it into a
    * per-key overlap join — blocking that also kills cross-entity pairs.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = (left.columns.toSet -- keyCols)
      .intersect(right.columns.toSet -- keyCols)
    require(overlap.isEmpty, s"non-key column names must be disjoint: $overlap")

    def bin(df: DataFrame, name: String): Column = {
      val axis = df.schema(name).dataType match {
        case TimestampType => unix_seconds(col(name))
        case TimestampNTZType => unix_seconds(col(name).cast(TimestampType))
        case DateType => unix_date(col(name)).cast("long")
        case _: NumericType => col(name).cast("long")
        case t => sys.error(s"unsupported range-join axis type $t for '$name'")
      }
      floor(axis / binWidth).cast("long")
    }

    val l = left.filter(col(leftEnd) >= col(leftStart))
      .withColumn("__bin", explode(sequence(bin(left, leftStart), bin(left, leftEnd))))
    val r = right.filter(col(rightEnd) >= col(rightStart))
      .withColumn("__bin", explode(sequence(bin(right, rightStart), bin(right, rightEnd))))
    l.join(r, ("__bin" +: keyCols).toIndexedSeq)
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      // Arbitration: keep the copy where __bin is the bin of the overlap's
      // left edge, i.e. of max(leftStart, rightStart). Both sides cover
      // that bin, so exactly one joined copy survives per pair.
      .filter(col("__bin") === {
        def axify(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
          dt match {
            case TimestampType => unix_seconds(c)
            case TimestampNTZType => unix_seconds(c.cast(TimestampType))
            case DateType => unix_date(c).cast("long")
            case _ => c.cast("long")
          }
        val la = axify(col(leftStart), left.schema(leftStart).dataType)
        val ra = axify(col(rightStart), right.schema(rightStart).dataType)
        floor(greatest(la, ra) / binWidth).cast("long")
      })
      .drop("__bin")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a reference and a current slice
  * of the same feed — the monitoring gate a production pipeline runs
  * before trusting (or publishing) a new batch: training-data mixture
  * shift, upstream schema/unit changes, and seasonality bugs all show up
  * here first.
  *
  * Both statistics emit PER-BUCKET rows with exact integer counts plus
  * the bucket's contribution term, so the cross-engine gate hashes
  * integers and one deterministically-derived double (fixed
  * parenthesization from exact longs, rounded) — no ordered global fold.
  * Σ terms downstream gives the scalar statistic (PSI > 0.2 ≈ major
  * shift by the usual credit-scoring rule of thumb; χ² vs its d.o.f.).
  *
  * Scale shape: each side reduces map-side to ≤bins rows (one
  * partial-agg'd groupBy per side over a broadcast binning), and the
  * term join runs on the bucket-sized frames. The inputs are never
  * joined row-to-row.
  */
object Drift {

  /** Population Stability Index contributions over `nBins` equal-width
    * bins derived from the REFERENCE min/max (the convention: the
    * reference defines the binning; current values outside clamp to the
    * edge bins). Output per bin: (bin, ref_cnt, cur_cnt, psi_term) with
    * psi_term = (p̂−q̂)·ln(p̂/q̂) under add-one smoothing
    * (p̂=(ref_cnt+1)/(ref_n+nBins)), rounded to `roundTo`. Bins with no
    * mass on either side still appear (their smoothed term is 0).
    */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int, roundTo: Int = 6): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val spark = ref.sparkSession
    // One row; lazily checkpointed because both sides' binning broadcasts
    // it — without truncation the reference min/max scan runs twice.
    val bounds = ref.agg(
      min(col(valueCol).cast("double")).as("__lo"),
      max(col(valueCol).cast("double")).as("__hi"))
      .localCheckpoint(false)

    def binned(df: DataFrame, cntCol: String): DataFrame = {
      val x = col(valueCol).cast("double")
      val width = (col("__hi") - col("__lo")) / nBins
      val bin = least(greatest(
        floor((x - col("__lo")) / width), lit(0.0)), lit((nBins - 1).toDouble))
        .cast("int")
      df.crossJoin(broadcast(bounds))
        .filter(x.isNotNull)
        .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(bin)
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cntCol))
    }

    import spark.implicits._
    val spine = (0 until nBins).toDF("bin")
    val counts = spine
      .join(binned(ref, "ref_cnt"), Seq("bin"), "left_outer")
      .join(binned(cur, "cur_cnt"), Seq("bin"), "left_outer")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      // Totals over the ≤nBins-row frame — broadcast-sized second pass.
      .localCheckpoint(false)
    val tot = counts.agg(sum("ref_cnt").as("__rn"), sum("cur_cnt").as("__cn"))
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        (round(psiTerm(col("ref_cnt"), col("__rn"), col("cur_cnt"),
          col("__cn"), nBins), roundTo) + lit(0.0)).as("psi_term"))
  }

  private def psiTerm(rc: Column, rn: Column, cc: Column, cn: Column,
      k: Int): Column = {
    val p = (rc.cast("double") + 1.0) / (rn.cast("double") + k)
    val q = (cc.cast("double") + 1.0) / (cn.cast("double") + k)
    (p - q) * log(p / q)
  }

  /** Categorical drift: per-category (ref_cnt, cur_cnt, psi_term) over
    * the UNION of categories seen on either side, same smoothing and
    * rounding as [[psiBins]]. Bucket count = distinct categories — keep
    * the column low-cardinality (that is what categorical monitoring
    * means) or bucket upstream.
    */
  def categorical(ref: DataFrame, cur: DataFrame, catCol: String,
      roundTo: Int = 6): DataFrame = {
    def counts(df: DataFrame, cntCol: String): DataFrame =
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(cntCol))
    val merged = counts(ref, "ref_cnt")
      .join(counts(cur, "cur_cnt"), Seq("category"), "full_outer")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .localCheckpoint(false)
    val k = merged.count().toInt.max(1)
    val tot = merged.agg(sum("ref_cnt").as("__rn"), sum("cur_cnt").as("__cn"))
    merged.crossJoin(broadcast(tot))
      .select(col("category"), col("ref_cnt"), col("cur_cnt"),
        (round(psiTerm(col("ref_cnt"), col("__rn"), col("cur_cnt"),
          col("__cn"), k), roundTo) + lit(0.0)).as("psi_term"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Marketing-style touch attribution: each CONVERSION event credits the
  * first and last TOUCH event by the same user inside a lookback window
  * ending at the conversion — the first-touch/last-touch report every
  * funnel dashboard derives revenue attribution from.
  *
  * Shape: a user-keyed equi-join with a range predicate (touch.ts in
  * (conv.ts − lookback, conv.ts]) — fan-out is touches-per-user-window,
  * the same bounded shape as [[RangeJoin]] — then ONE partial-agg'd
  * reduction per conversion via lexicographic struct min/max (ties
  * resolve on (ts, tie), deterministic under any partitioning).
  * Conversions with no touch in the window survive the left join with
  * `none` credit, so totals reconcile against the conversion count.
  */
object Attribution {

  /** One row per conversion: (user, conv id/ts, first_touch, last_touch,
    * n_touches). `isConversion` / `isTouch` are predicates over the
    * event row (an event may be neither; an event matching both counts
    * as a touch for LATER conversions only — a conversion never
    * attributes to itself).
    */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, isConversion: Column, isTouch: Column,
      lookbackSeconds: Long): DataFrame = {
    val conv = events.filter(isConversion)
      .select(col(userCol).as("__u"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"))
    val touch = events.filter(isTouch)
      .select(col(userCol).as("__u"), col(idCol).as("__tid"),
        col(tsCol).as("__tts"), col(typeCol).as("__ttype"))
    conv.join(touch,
        conv("__u") === touch("__u") &&
          col("__tts") < col("conv_ts") &&
          col("__tts") >= col("conv_ts") - expr(s"INTERVAL $lookbackSeconds SECOND"),
        "left")
      .groupBy(conv("__u").as("user_id"), col("conv_id"), col("conv_ts"))
      .agg(
        min(when(col("__tid").isNotNull,
          struct(col("__tts"), col("__tid"), col("__ttype")))).as("__first"),
        max(when(col("__tid").isNotNull,
          struct(col("__tts"), col("__tid"), col("__ttype")))).as("__last"),
        count(col("__tid")).as("n_touches"))
      .select(col("user_id"), col("conv_id"), col("conv_ts"),
        coalesce(col("__first.__ttype"), lit("none")).as("first_touch"),
        coalesce(col("__last.__ttype"), lit("none")).as("last_touch"),
        col("n_touches"))
  }

  /** The report form: conversion counts by (first_touch, last_touch). */
  def report(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, isConversion: Column, isTouch: Column,
      lookbackSeconds: Long): DataFrame =
    touchAttribution(events, userCol, tsCol, typeCol, idCol,
        isConversion, isTouch, lookbackSeconds)
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("n_touches")).as("n_touches"))
}

package graft.enrich

import graft.ops.AsOfJoin
import graft.parse.ValueOverride
import graft.reports.{ExclusionRange, MappingRule}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver enrichment stages (SURVEY.md §2.2 P8/P19, §2.3 J4/J5): temporal
  * username remapping, exclusion windows, and the as-of price value
  * override. All `DataFrame => DataFrame`, all expression-only.
  */
object Enrichment {

  /** Temporal username remap (`3_transform_data.py:138-168`).
    *
    * The reference iterates rules in REVERSE config order, rewriting the
    * column in place each time; because each rule's source-match reads the
    * CURRENT value, a later rule effectively wins, and chained renames
    * (rule k maps A→B, earlier rule j maps B→C) compose. A layered
    * `when(...).otherwise(prev)` fold reproduces that exactly — rules are
    * config-sized, so the nested expression stays small, codegen'd, and
    * shuffle-free.
    */
  def applyUsernameMapping(
      df: DataFrame,
      rules: Seq[MappingRule],
      usernameColumns: Seq[String] = Seq("Username", "Action_By", "Opponent")): DataFrame = {
    if (rules.isEmpty) return df
    val ts = col("Timestamp")
    usernameColumns.filter(df.columns.contains).foldLeft(df) { (acc, colName) =>
      val rewritten = rules.reverse.foldLeft(col(colName)) { (current, rule) =>
        val timeOk = Seq(
          rule.startDate.map(s => ts >= lit(s)),
          rule.endDate.map(e => ts < lit(e))).flatten
          .foldLeft(lit(true))(_ && _)
        when(current.isin(rule.sourceUsernames.map(lit): _*) && timeOk,
          lit(rule.targetUsername)).otherwise(current)
      }
      acc.withColumn(colName, rewritten)
    }
  }

  /** Overlap warnings for mapping rules (`3_transform_data.py:103-136`) —
    * config-sized, computed on the driver.
    */
  def validateMappingRules(rules: Seq[MappingRule]): Seq[String] = {
    val processed = rules.zipWithIndex.map { case (r, i) =>
      (r.sourceUsernames.toSet,
        r.startDate.map(_.getTime).getOrElse(Long.MinValue),
        r.endDate.map(_.getTime).getOrElse(Long.MaxValue),
        i + 1)
    }
    for {
      Seq((s1, a1, e1, i1), (s2, a2, e2, i2)) <- processed.combinations(2).toSeq
      common = s1.intersect(s2)
      if common.nonEmpty && a1 < e2 && a2 < e1
    } yield s"Conflict: rule #$i1 and rule #$i2 both apply to " +
      s"'${common.mkString(", ")}' in an overlapping period; the later rule wins."
  }

  /** Exclusion windows (`3_transform_data.py:172-221`): drop rows inside
    * [start, end] (END-INCLUSIVE) for the listed broadcast types, or every
    * type when the sentinel "All Broadcasts" is present. Rules with no
    * types are ignored, as in the reference.
    */
  def applyExclusionFilters(df: DataFrame, ranges: Seq[ExclusionRange]): DataFrame = {
    val active = ranges.filter(_.excludeTypes.nonEmpty)
    if (active.isEmpty) return df
    val ts = col("Timestamp")
    val dropMask: Column = active.map { r =>
      val inWindow = ts >= lit(r.start) && ts <= lit(r.end)
      if (r.excludeTypes.contains("All Broadcasts")) inWindow
      else inWindow && col("Broadcast_Type").isin(r.excludeTypes.map(lit): _*)
    }.reduce(_ || _)
    df.filter(!dropMask)
  }

  /** Item-value override with dynamic as-of price
    * (`2_parse_engine.py:16-63,177-197`): when `Item_Value` is null-or-zero
    * and the item is configured, use the price at the broadcast date
    * (exact day, else latest earlier, else earliest later) when the
    * override names an item id, falling back to the configured constant.
    *
    * The reference probes SQLite three times PER ROW (a severe N+1); here
    * it is ONE distributed as-of join against the whole price series —
    * identical results, shuffle-partitioned by item.
    */
  def applyValueOverrides(
      broadcasts: DataFrame,
      overrides: Seq[ValueOverride],
      itemPrices: DataFrame): DataFrame = {
    if (overrides.isEmpty) return broadcasts

    val spark = broadcasts.sparkSession
    import spark.implicits._
    val dim = overrides
      .map(o => (o.itemName, o.fallback, o.itemId))
      .toDF("__ov_item", "__ov_fallback", "__ov_item_id")

    // Day-granularity price series, one row per (item, day): the reference
    // compares DATE(timestamp), resolving several same-day prices with
    // ORDER BY timestamp DESC LIMIT 1 → keep the latest row per day.
    val daily = graft.ops.Dedup.keepFirst(
      itemPrices.select(
        col("item_id").as("__ov_item_id"),
        to_date(col("timestamp")).as("__price_date"),
        col("avg_high_price"), col("timestamp")),
      Seq("__ov_item_id", "__price_date"),
      Seq(col("timestamp").desc))
      .drop("timestamp")

    val needsOverride = col("Item_Value").isNull || col("Item_Value") === 0

    val withDim = broadcasts
      .join(broadcast(dim), col("Item_Name") === col("__ov_item"), "left")
      .withColumn("__probe_date", to_date(col("Timestamp")))

    val withPrice = AsOfJoin.join(
      probe = withDim,
      build = daily.withColumnRenamed("avg_high_price", "__dyn_price"),
      keys = Seq("__ov_item_id"),
      probeTime = "__probe_date",
      buildTime = "__price_date",
      valueCols = Seq("__dyn_price"))

    // Reference quirk, reproduced: the override branch runs for ANY row
    // with a falsy Item_Value and a non-null Item_Name — items without a
    // configured override get value NULL (dyn and fallback both absent),
    // so a parsed 0 becomes null (2_parse_engine.py:177-197).
    withPrice
      .withColumn("Item_Value",
        when(needsOverride && col("Item_Name").isNotNull,
          coalesce(col("__dyn_price"), col("__ov_fallback")))
          .otherwise(col("Item_Value")))
      .drop("__ov_item", "__ov_fallback", "__ov_item_id", "__probe_date", "__dyn_price")
  }
}

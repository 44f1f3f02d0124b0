package graft.reports

import graft.ops.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collection-log summary (`/root/reference/src/3_transform_data.py:392-514`):
  * filter source types → item-name exclusion rules → keep-first dedup for
  * the configured type only → "72 x Onyx bolts" quantity parse → per-period
  * quantity sums over the item universe (DB ∪ historical) → historical
  * initial counts folded into All_Time → group structure join with
  * ungrouped items routed to the catch-all group.
  *
  * Output: Group, Item_Name, {All_Time,YTD,Prev_Month,Prev_Week,
  * Custom_Days}_Count — items repeat across groups by design.
  *
  * Plan shape: one conditional-agg shuffle for all period counts; every
  * join after it is against config-sized dimensions (broadcast).
  */
object CollectionLog {

  /** `"72 x Onyx bolts"` → (name, qty); qty defaults to 1. Anchored like
    * the reference's `re.match` (`:434-453`).
    */
  def parseQuantity(itemName: Column): (Column, Column) = {
    val pat = """^([\d,]+)\s*x\s*(.+)"""
    val qtyStr = regexp_extract(trim(itemName), pat, 1)
    val name = when(qtyStr =!= "", trim(regexp_extract(trim(itemName), pat, 2)))
      .otherwise(trim(itemName))
    val qty = when(qtyStr =!= "", regexp_replace(qtyStr, ",", "").cast("long"))
      .otherwise(lit(1L))
    (name, qty)
  }

  def generate(
      broadcasts: DataFrame,
      clogDef: CollectionLogDef,
      hist: ClogHistoricalData,
      periods: Seq[Period]): DataFrame = {
    val spark = broadcasts.sparkSession
    import spark.implicits._

    var src = broadcasts.filter(col("Broadcast_Type").isin(clogDef.sourceTypes.map(lit): _*))

    // Flat exclusion list (the clog variant of the rules is a plain
    // blacklist — reference flattens the rule sets, `:409-422`).
    val flatExcludes = hist.excludeRules.flatten
    if (flatExcludes.nonEmpty)
      src = src.filter(!col("Item_Name").isin(flatExcludes.map(lit): _*))

    // Keep-first dedup per (Username, Item_Name) for the dedup type only.
    // pandas drop_duplicates keeps first in FRAME order ≈ parse order; the
    // deterministic window form orders by (Timestamp, raw_log_id).
    src = clogDef.deduplicationType match {
      case Some(t) =>
        val toDedup = src.filter(col("Broadcast_Type") === t)
        val others = src.filter(!(col("Broadcast_Type") <=> t))
        Dedup.keepFirst(toDedup, Seq("Username", "Item_Name"),
          Seq(col("Timestamp").asc, col("raw_log_id").asc))
          .unionByName(others)
      case None => src
    }

    val (nameCol, qtyCol) = parseQuantity(col("Item_Name"))
    val parsed = src
      .filter(col("Item_Name").isNotNull)
      .select(nameCol.as("Item_Name"), qtyCol.as("__qty"), col("Timestamp"))

    // Single-pass period pivot of quantity sums.
    val aggs = periods.map { p =>
      val in = p.start
        .map(s => col("Timestamp") >= lit(s) && col("Timestamp") < lit(p.end))
        .getOrElse(col("Timestamp") < lit(p.end))
      sum(when(in, col("__qty")).otherwise(0L)).as(s"${p.key}_Count")
    }
    val dbCounts = parsed.groupBy("Item_Name").agg(aggs.head, aggs.tail: _*)

    // Item universe = DB items ∪ historical keys, with zero-filled counts.
    val histCounts = hist.initialCounts.toSeq.toDF("Item_Name", "__hist")
    val universe = dbCounts.select("Item_Name")
      .unionByName(histCounts.select("Item_Name")).distinct()

    val countCols = periods.map(p => s"${p.key}_Count")
    val counts = universe
      .join(dbCounts, Seq("Item_Name"), "left")
      .join(broadcast(histCounts), Seq("Item_Name"), "left")
      .select(Seq(col("Item_Name")) ++ countCols.map {
        case "All_Time_Count" =>
          (coalesce(col("All_Time_Count"), lit(0L)) +
            coalesce(col("__hist"), lit(0L))).as("All_Time_Count")
        case c => coalesce(col(c), lit(0L)).as(c)
      }: _*)

    // Group structure (an item may belong to several groups); items with
    // drops but no group go to the catch-all.
    val grouped = hist.groups
      .flatMap { case (title, items) => items.map(i => (title, i)) }
      .toDF("Group", "Item_Name")
    val groupedItemNames: Seq[String] = hist.groups.flatMap(_._2).distinct
    val groupedItems = groupedItemNames.toDF("Item_Name")
    val ungrouped = counts
      .filter(col("All_Time_Count") > 0)
      .join(groupedItems, Seq("Item_Name"), "left_anti")
      .select(lit(hist.otherGroupName).as("Group"), col("Item_Name"))

    grouped.unionByName(ungrouped)
      .join(counts, Seq("Item_Name"), "left")
      .select(Seq(col("Group"), col("Item_Name")) ++
        countCols.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
  }
}

package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by domain groups under [[graft.queries]]; each
  * group pairs Spark implementations with DuckDB oracle SQL (or omits the
  * oracle for non-SQL-expressible operators → rows-only check).
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    EventQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    ParseQueries,
    IngestQueries,
    MultimodalQueries,
    SketchQueries,
    GraphQueries,
    MlQueries,
    CorpusStatsQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the single-pass period-pivoted leaderboard (SURVEY §2.4 A1+A2).
    */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("q_period_pivot")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Contract (driver, see /root/repo/SURVEY.md §5 + builder prompt):
  *  - `queries`: name → (spark, sfDir) => DataFrame over the fixture tables;
  *  - `oracles`: name → equivalent DuckDB SQL over the same tables
  *    (omit a key for ops not expressible in SQL → weaker rows-only check).
  *
  * Conventions keeping the hash-compare stable:
  *  - every output column lowercase snake_case, aliased identically on both
  *    sides (the driver sorts columns by NAME before hashing);
  *  - no raw nanosecond timestamps in output (Spark truncates parquet ns →
  *    µs; DuckDB keeps ns) — emit dates or second-truncated strings;
  *  - double sums routed through DECIMAL(18,2|4) so accumulation is exact
  *    and order-independent on both engines;
  *  - every window/limit has a total deterministic order (explicit id
  *    tie-break).
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}

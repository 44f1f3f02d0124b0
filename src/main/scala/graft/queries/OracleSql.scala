package graft.queries

/** Shared DuckDB oracle-SQL fragments mirroring the engine's codegen'd
  * text primitives ([[graft.expr.WordShingles]]): normalized whitespace
  * tokens and word n-gram shingle lists. Kept in ONE place so every
  * oracle that re-derives shingles (dedup family, repetition profile)
  * stays bit-compatible with the Spark side.
  */
private[queries] object OracleSql {

  /** Normalized token list: lower → collapse whitespace → trim → split. */
  val toksSql: String =
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"

  /** n-shingle list exactly mirroring WordShingles: indices
    * 0..max(len-n,0), windows past the end dropped (short docs → empty).
    */
  def shinglesSqlN(n: Int): String =
    s"""list_filter(
       |  list_transform(range(0, greatest(len($toksSql) - $n, 0) + 1),
       |    i -> CASE WHEN i + $n <= len($toksSql)
       |      THEN array_to_string(list_slice($toksSql, i + 1, i + $n), ' ') END),
       |  x -> x IS NOT NULL)""".stripMargin
}

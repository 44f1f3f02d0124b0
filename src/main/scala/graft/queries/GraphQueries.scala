package graft.queries

import graft.Tables
import graft.graph.PageRank
import org.apache.spark.sql.functions._

/** Graph operators over a deterministic planted link graph (the synthetic
  * corpus has no link column, so edges derive from doc_id arithmetic —
  * identically in the oracle SQL, the same planted-data pattern as
  * q_pii_redact). 3 pseudo-random out-links per document ≈ a small web
  * graph with hubs wherever the multipliers collide.
  */
object GraphQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // Fixed-point PageRank, 3 iterations — exact BIGINT arithmetic end to
    // end, so the DuckDB oracle reproduces every rank bit-for-bit.
    "q_pagerank" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val edges = docs.crossJoin(broadcast(n)).select(
        col("doc_id").as("src"),
        explode(array(
          pmod(col("doc_id") * 31 + 0, col("__n")),
          pmod(col("doc_id") * 57 + 1, col("__n")),
          pmod(col("doc_id") * 91 + 2, col("__n")))).as("dst"))
      PageRank.ranks(edges, "src", "dst", iterations = 3)
    }))

  val oracles: Map[String, String] = Map(
    // Same recurrence unrolled: all divisions integer (`//`, non-negative
    // operands, so DuckDB floor == Spark `div` truncation), contribution
    // sums cast back from HUGEINT.
    "q_pagerank" ->
      """WITH cnt AS (SELECT count(*) AS n FROM documents),
        |e AS (
        |  SELECT doc_id AS src, (doc_id * 31 + 0) % n AS dst FROM documents, cnt
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 57 + 1) % n FROM documents, cnt
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 91 + 2) % n FROM documents, cnt),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |b AS (SELECT 1000000000000 // count(*) AS base FROM nodes),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT node, base AS r FROM nodes, b),
        |c1 AS (SELECT e.dst AS node, CAST(sum(r0.r // deg.d) AS BIGINT) AS c
        |       FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nodes.node, (15 * base + 85 * COALESCE(c, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN b LEFT JOIN c1 ON c1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, CAST(sum(r1.r // deg.d) AS BIGINT) AS c
        |       FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nodes.node, (15 * base + 85 * COALESCE(c, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN b LEFT JOIN c2 ON c2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, CAST(sum(r2.r // deg.d) AS BIGINT) AS c
        |       FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT nodes.node, (15 * base + 85 * COALESCE(c, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN b LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT node, r AS rank_fp FROM r3""".stripMargin)
}

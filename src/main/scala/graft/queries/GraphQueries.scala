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

  /** The deterministic planted link graph every query here shares — 3
    * pseudo-random out-links per document — built ONCE so the Scala side
    * and the `rawEdgesSql` oracle preamble cannot drift apart.
    */
  private def plantedEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("__n"))
    docs.crossJoin(broadcast(n)).select(
      col("doc_id").as("src"),
      explode(array(
        pmod(col("doc_id") * 31 + 0, col("__n")),
        pmod(col("doc_id") * 57 + 1, col("__n")),
        pmod(col("doc_id") * 91 + 2, col("__n")))).as("dst"))
  }

  /** Oracle preamble mirroring [[plantedEdges]]: CTEs `cnt` and `raw`
    * (src, dst with self-loops and duplicates intact).
    */
  private val rawEdgesSql: String =
    """cnt AS (SELECT count(*) AS n FROM documents),
      |raw AS (
      |  SELECT doc_id AS src, (doc_id * 31 + 0) % n AS dst FROM documents, cnt
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 57 + 1) % n FROM documents, cnt
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 91 + 2) % n FROM documents, cnt)""".stripMargin

  val queries: Map[String, Q] = Map(
    // Fixed-point PageRank, 3 iterations — exact BIGINT arithmetic end to
    // end, so the DuckDB oracle reproduces every rank bit-for-bit.
    "q_pagerank" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      PageRank.ranks(edges, "src", "dst", iterations = 3)
    }),

    // Per-node triangle counts over the same planted graph, degree-ordered
    // orientation (each triangle enumerated exactly once at its lowest-
    // ranked corner; O(√m) oriented out-degree bounds the wedge fan-out).
    "q_triangles" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      graft.graph.Triangles.perNode(edges, "src", "dst")
    }),

    // Synchronous label-propagation communities, 3 rounds — majority vote
    // with min-label tie-break, all integer counting.
    "q_label_prop" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      graft.graph.LabelPropagation.communities(edges, "src", "dst", rounds = 3)
    }),

    // Personalized PageRank from seeds {0, 1}, 3 iterations — proximity-
    // to-seed scoring, same integer fixed-point contract as q_pagerank.
    "q_ppr" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      PageRank.personalized(edges, "src", "dst", sources = Seq(0L, 1L),
        iterations = 3)
    }),

    // Modularity of the 3-round label-prop communities — integer-exact
    // per-community numerators (Q = Σ q_num / 4m²): the quality gate that
    // tells you whether a community structure is better than chance.
    "q_modularity" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      val labels = graft.graph.LabelPropagation.communities(
        edges, "src", "dst", rounds = 3)
      graft.graph.Modularity.perCommunity(edges, "src", "dst", labels)
    }),

    // Single-source BFS distances (source = doc 0, depth cap 6) — frontier
    // expansion with early exit; the oracle replays it as a depth-capped
    // recursive CTE.
    "q_shortest_path" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      graft.graph.ShortestPaths.bfs(edges, "src", "dst", source = 0L,
        maxDepth = 6)
    }),

    // Bounded-round 3-core peeling, 4 rounds — the dense-subgraph sieve.
    "q_kcore" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      graft.graph.KCore.peel(edges, "src", "dst", k = 3, rounds = 4)
    }),

    // HyperANF neighborhood function NF(t), t ∈ [0,3]: per-node HLL
    // counters merged along edges — the distance-distribution estimator
    // for graphs where n BFS runs are infeasible. Register tables and
    // estimator are md5-deterministic, so DuckDB rebuilds every counter
    // and the DECIMAL-summed NF bit-for-bit (same machinery as
    // q_hll_distinct, iterated).
    "q_hyperanf" -> ((s, dir) => {
      val edges = plantedEdges(s, dir)
      graft.graph.HyperAnf.neighborhoodFunction(edges, "src", "dst",
        rounds = 3)
    }))

  val oracles: Map[String, String] = Map(
    // Same recurrence unrolled: all divisions integer (`//`, non-negative
    // operands, so DuckDB floor == Spark `div` truncation), contribution
    // sums cast back from HUGEINT.
    // Same unrolled recurrence with the teleport term gated on the seed
    // set: base = SCALE // |S| is the 500000000000 literal.
    "q_ppr" -> {
      def pprRound(i: Int): String =
        s"""pc$i AS (SELECT e.dst AS node, CAST(sum(pr${i - 1}.r // deg.d) AS BIGINT) AS c
           |       FROM e JOIN deg USING (src) JOIN pr${i - 1} ON pr${i - 1}.node = e.src
           |       GROUP BY e.dst),
           |pr$i AS (SELECT nodes.node,
           |         (CASE WHEN nodes.node IN (0, 1) THEN 15 * 500000000000 ELSE 0 END
           |          + 85 * COALESCE(c, 0)) // 100 AS r
           |       FROM nodes LEFT JOIN pc$i ON pc$i.node = nodes.node)""".stripMargin
      s"""WITH $rawEdgesSql,
        |e AS (SELECT src, dst FROM raw),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |pr0 AS (SELECT node,
        |  CASE WHEN node IN (0, 1) THEN 500000000000 ELSE 0 END AS r
        |  FROM nodes),
        |${(1 to 3).map(pprRound).mkString(",\n")}
        |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM pr3""".stripMargin
    },

    "q_pagerank" ->
      s"""WITH $rawEdgesSql,
        |e AS (SELECT src, dst FROM raw),
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
        |SELECT node, r AS rank_fp FROM r3""".stripMargin,

    // Same orientation restated: canonical undirected edges, (degree, id)
    // row-value ordering, wedge+close joins — all integer counting.
    "q_triangles" ->
      s"""WITH $rawEdgesSql,
        |e0 AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src <> dst),
        |nodes AS (SELECT a AS node FROM e0 UNION SELECT b FROM e0),
        |deg AS (
        |  SELECT node, count(*) AS d
        |  FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        |  GROUP BY node),
        |o AS (
        |  SELECT CASE WHEN (da.d, e0.a) < (db.d, e0.b) THEN e0.a ELSE e0.b END AS u,
        |         CASE WHEN (da.d, e0.a) < (db.d, e0.b) THEN e0.b ELSE e0.a END AS v
        |  FROM e0 JOIN deg da ON da.node = e0.a JOIN deg db ON db.node = e0.b),
        |t AS (
        |  SELECT w1.u AS u, w1.v AS x, w2.v AS y
        |  FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v <> w2.v
        |  JOIN o c ON c.u = w1.v AND c.v = w2.v),
        |cr AS (
        |  SELECT u AS node FROM t
        |  UNION ALL SELECT x FROM t
        |  UNION ALL SELECT y FROM t),
        |tc AS (SELECT node, count(*) AS c FROM cr GROUP BY node)
        |SELECT nodes.node, CAST(coalesce(tc.c, 0) AS BIGINT) AS triangles
        |FROM nodes LEFT JOIN tc USING (node)""".stripMargin,

    // Same synchronous rounds unrolled: per-round neighbor-vote counts,
    // argmax via (votes DESC, label ASC) row_number.
    "q_label_prop" -> {
      def round(i: Int): String =
        s"""v$i AS (
           |  SELECT nb.node, l${i - 1}.label, count(*) AS c
           |  FROM nb JOIN l${i - 1} ON l${i - 1}.node = nb.nbr GROUP BY 1, 2),
           |l$i AS (
           |  SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER
           |      (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
           |    FROM v$i) WHERE rn = 1)""".stripMargin
      s"""WITH $rawEdgesSql,
         |e0 AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst),
         |nb AS (
         |  SELECT a AS node, b AS nbr FROM e0
         |  UNION ALL SELECT b, a FROM e0),
         |l0 AS (SELECT DISTINCT node, node AS label FROM nb),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT node, label FROM l3""".stripMargin
    },

    // The same 3 label-prop rounds, then modularity restated relationally:
    // labeled edges, intra counts, degree sums, all-BIGINT numerators.
    "q_modularity" -> {
      def round(i: Int): String =
        s"""v$i AS (
           |  SELECT nb.node, l${i - 1}.label, count(*) AS c
           |  FROM nb JOIN l${i - 1} ON l${i - 1}.node = nb.nbr GROUP BY 1, 2),
           |l$i AS (
           |  SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER
           |      (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
           |    FROM v$i) WHERE rn = 1)""".stripMargin
      s"""WITH $rawEdgesSql,
         |e0 AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst),
         |nb AS (
         |  SELECT a AS node, b AS nbr FROM e0
         |  UNION ALL SELECT b, a FROM e0),
         |l0 AS (SELECT DISTINCT node, node AS label FROM nb),
         |${(1 to 3).map(round).mkString(",\n")},
         |led AS (
         |  SELECT la.label AS la, lb.label AS lb
         |  FROM e0 JOIN l3 AS la ON la.node = e0.a
         |          JOIN l3 AS lb ON lb.node = e0.b),
         |m AS (SELECT count(*) AS m FROM led),
         |intra AS (
         |  SELECT la AS label, count(*) AS e_intra FROM led
         |  WHERE la = lb GROUP BY 1),
         |deg AS (
         |  SELECT label, count(*) AS d_total FROM (
         |    SELECT la AS label FROM led UNION ALL SELECT lb FROM led)
         |  GROUP BY label)
         |SELECT deg.label,
         |  CAST(coalesce(intra.e_intra, 0) AS BIGINT) AS e_intra,
         |  CAST(deg.d_total AS BIGINT) AS d_total,
         |  CAST(4 * m.m * coalesce(intra.e_intra, 0)
         |    - deg.d_total * deg.d_total AS BIGINT) AS q_num
         |FROM deg LEFT JOIN intra USING (label) CROSS JOIN m""".stripMargin
    },

    // Depth-capped recursive walk; UNION-mode recursion dedups visited
    // (node, dist) pairs so min(dist) is the BFS distance. The dist < 6
    // guard mirrors the Spark side's maxDepth = 6.
    "q_shortest_path" ->
      s"""WITH RECURSIVE $rawEdgesSql,
        |e AS (SELECT src, dst FROM raw),
        |walk(node, dist) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, 0 AS dist
        |  UNION
        |  SELECT e.dst, walk.dist + 1
        |  FROM walk JOIN e ON e.src = walk.node AND e.src <> e.dst
        |  WHERE walk.dist < 6)
        |SELECT node, CAST(min(dist) AS INT) AS dist
        |FROM walk GROUP BY node""".stripMargin,

    // Same 4 peel rounds unrolled; final report re-derives degrees in the
    // surviving subgraph and applies the same >= k gate.
    "q_kcore" -> {
      def round(r: Int): String =
        s"""d$r AS (
           |  SELECT node, count(*) AS degree FROM (
           |    SELECT a AS node FROM e${r - 1}
           |    UNION ALL SELECT b FROM e${r - 1})
           |  GROUP BY node),
           |n$r AS (SELECT node FROM d$r WHERE degree >= 3),
           |e$r AS (
           |  SELECT a, b FROM e${r - 1}
           |  WHERE a IN (SELECT node FROM n$r)
           |    AND b IN (SELECT node FROM n$r))""".stripMargin
      s"""WITH $rawEdgesSql,
         |e0 AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
         |  SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
         |GROUP BY node HAVING count(*) >= 3""".stripMargin
    },

    // HyperANF: singleton-HLL init (md5 of the node id's decimal string),
    // 3 merge rounds unrolled (HLL union = per-register max over self ∪
    // out-neighbors), then the q_hll_distinct estimator per node and a
    // DECIMAL(38,4) sum of 4-decimal-rounded estimates — exact,
    // order-independent, bit-identical to the Spark side.
    "q_hyperanf" -> {
      def mergeRound(i: Int): String =
        s"""r$i AS (
           |  SELECT node, reg, max(rho) AS rho FROM (
           |    SELECT node, reg, rho FROM r${i - 1}
           |    UNION ALL
           |    SELECT e.src AS node, r.reg, r.rho
           |    FROM e JOIN r${i - 1} r ON r.node = e.dst)
           |  GROUP BY node, reg)""".stripMargin
      def nfOf(i: Int): String =
        s"""a$i AS (
           |  SELECT node, count(*) AS present,
           |    sum(1::BIGINT << (53 - rho)) AS sp
           |  FROM r$i GROUP BY node),
           |v$i AS (
           |  SELECT CAST(sp + (256 - present) * (1::BIGINT << 53) AS DOUBLE) AS sd,
           |    CAST(256 - present AS DOUBLE) AS v
           |  FROM a$i),
           |nf$i AS (
           |  SELECT sum(CAST(round(
           |      CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
           |            * 9007199254740992.0 / sd <= 640.0 AND v > 0.0
           |        THEN 256.0 * ln(256.0 / v)
           |        ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
           |            * 9007199254740992.0 / sd END, 4) AS DECIMAL(38,4)))
           |    AS nf
           |  FROM v$i)""".stripMargin
      s"""WITH $rawEdgesSql,
         |e AS (SELECT DISTINCT src, dst FROM raw),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |h AS (
         |  SELECT node,
         |    CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM nodes),
         |r0 AS (
         |  SELECT node, h % 256 AS reg,
         |    CASE WHEN (h >> 8) = 0 THEN 53
         |         ELSE 53 - length(bin(h >> 8)) END AS rho
         |  FROM h),
         |${(1 to 3).map(mergeRound).mkString(",\n")},
         |${(0 to 3).map(nfOf).mkString(",\n")},
         |u AS (
         |  SELECT 0 AS t, CAST(nf AS DOUBLE) AS nf FROM nf0
         |  UNION ALL SELECT 1, CAST(nf AS DOUBLE) FROM nf1
         |  UNION ALL SELECT 2, CAST(nf AS DOUBLE) FROM nf2
         |  UNION ALL SELECT 3, CAST(nf AS DOUBLE) FROM nf3)
         |SELECT t, nf, round(nf / max(nf) OVER (), 6) AS nf_frac FROM u"""
        .stripMargin
    })
}

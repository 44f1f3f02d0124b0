package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.KMeans

/** Distributed-ML primitives over the embeddings table: the codebook /
  * clustering layer a curation pipeline runs between dedup and sampling
  * (cluster-then-sample, IVF cell assignment, PQ codebooks).
  */
object MlQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // Lloyd's k-means, k=8, 3 rounds, integer milli-unit arithmetic: seeds
    // are the 8 smallest md5(vec_id) rows, assignment is an argmin over 8
    // codegen'd literal-centroid dot products (map-only), each update is
    // one (cluster,pos)-keyed partial-agg'd shuffle of k×64 slim rows.
    // Exact integers end to end → bit-identical to the unrolled oracle.
    "q_kmeans" -> ((s, dir) =>
      KMeans.fitAssign(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iterations = 3)))

  // The same recurrence unrolled in DuckDB: quantize → seed by md5 order →
  // 3 × (argmin assign, floor-divided centroid update) → final assign.
  // list_dot_product over integer-valued doubles is exact, so accumulation
  // order can't split the engines; floor(sum/count) matches Spark's
  // floor(sum/count) on identical IEEE doubles.
  private def kmeansAssign(name: String, cents: String): String =
    s"""$name AS (
       |  SELECT vec_id, v, c FROM (
       |    SELECT q.vec_id, q.v, $cents.c,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product($cents.v, $cents.v)
       |          - 2 * list_dot_product(q.v, $cents.v), $cents.c) AS rn
       |    FROM q CROSS JOIN $cents) WHERE rn = 1)""".stripMargin

  private def kmeansUpdate(i: Int): String =
    s"""u$i AS (
       |  SELECT c, i, floor(sum(v[i]) / count(*)) AS cv
       |  FROM a$i, range(1, 65) t(i) GROUP BY c, i),
       |c$i AS (
       |  SELECT c${i - 1}.c, coalesce(u.v, c${i - 1}.v) AS v
       |  FROM c${i - 1} LEFT JOIN
       |    (SELECT c, list(cv ORDER BY i) AS v FROM u$i GROUP BY c) u
       |    USING (c))""".stripMargin

  private val kmeansIters = 3

  private val kmeansSql: String = {
    val rounds = (1 to kmeansIters)
      .map(i => kmeansAssign(s"a$i", s"c${i - 1}") + ",\n" + kmeansUpdate(i))
      .mkString(",\n")
    val fc = s"c$kmeansIters"
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS v
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |c0 AS (
       |  SELECT c, v FROM (
       |    SELECT row_number() OVER
       |      (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c, v
       |    FROM q) WHERE c < 8),
       |$rounds,
       |af AS (
       |  SELECT vec_id, v, c, sc FROM (
       |    SELECT q.vec_id, q.v, $fc.c,
       |      list_dot_product($fc.v, $fc.v)
       |        - 2 * list_dot_product(q.v, $fc.v) AS sc,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product($fc.v, $fc.v)
       |          - 2 * list_dot_product(q.v, $fc.v), $fc.c) AS rn
       |    FROM q CROSS JOIN $fc) WHERE rn = 1)
       |SELECT vec_id, CAST(c AS INT) AS cluster,
       |  CAST(list_dot_product(v, v) + sc AS BIGINT) AS dist
       |FROM af""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_kmeans" -> kmeansSql)
}

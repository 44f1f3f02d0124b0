package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators a training-data curation pipeline reports
  * on every crawl snapshot: vocabulary-growth (Heaps' law) curves, a
  * Zipf power-law fit of the token frequency distribution, and
  * ROUGE/BLEU n-gram overlap scoring between document pairs (the
  * reference-vs-candidate metric every summarization/dedup eval uses).
  *
  * All three are pure relational aggregations of the token/shingle
  * tables ([[graft.expr.WordShingles]] on the Spark side,
  * [[OracleSql]] fragments on the DuckDB side): token-keyed shuffles
  * carry (token, count) scalars; nothing materializes per-document
  * token vectors; every floating-point readout either rides an exact
  * integer/DECIMAL sum or is a single per-row division of exact
  * integers, so the DuckDB oracles reproduce each value bit-for-bit
  * (round(6) absorbs ln/exp ulps — the q_bm25 contract).
  */
object CorpusStatsQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // Heaps'-law vocabulary growth: corpus split into 10 doc_id-range
    // buckets; per bucket the token volume and the count of NEW types
    // (tokens whose FIRST occurrence falls in the bucket), plus
    // cumulative curves. First occurrence is a token-keyed min — the
    // vocabulary-sized shuffle carries (token, min_doc) scalars. The
    // cumulative window runs over exactly 10 rows (bounded by
    // construction — not a data-sized global window).
    "q_vocab_growth" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // The 1-row bounds frame is referenced by both bucket pipelines;
      // checkpoint it so the doc_id min/max scan runs once. The exploded
      // token table is deliberately NOT checkpointed: both consumers
      // reduce it map-side immediately, and re-running a codegen'd
      // scan+explode is cheaper at scale than materializing
      // occurrence-level rows.
      val bounds = docs.agg(min(col("doc_id")).as("__lo"),
        (max(col("doc_id")) + 1).as("__hi"))
        .localCheckpoint(eager = false)
      val toks = docs.select(col("doc_id"),
          explode(split(graft.ops.Dedup.normalizeText(col("text")), " "))
            .as("tok"))
        .filter(col("tok") =!= "")
      // Integer `div` (not `/`, which is a double divide) so the bucket
      // id is exact at any doc_id magnitude — mirrors DuckDB's `//`.
      val bucketExpr = expr("((__bd - __lo) * 10) div (__hi - __lo)")
      val occ = toks.crossJoin(broadcast(bounds))
        .withColumn("__bd", col("doc_id"))
        .select(bucketExpr.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
      val fresh = toks.groupBy("tok").agg(min(col("doc_id")).as("__bd"))
        .crossJoin(broadcast(bounds))
        .select(bucketExpr.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("new_types"))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      occ.join(fresh, Seq("bucket"), "left")
        .select(col("bucket").cast("int").as("bucket"), col("n_tokens"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("cum_types", sum(col("new_types")).over(w))
    }),

    // Zipf power-law fit: OLS of ln(freq) on ln(rank) over the top-200
    // tokens (TakeOrderedAndProject — never a global sort). Each OLS
    // term is a fixed double expression scaled to an exact BIGINT
    // (round(x·10¹²)), so the four sums are integer-exact and
    // aggregation-order-independent; the slope/intercept division
    // happens once at the end. English-like corpora land near
    // slope ≈ −1.
    "q_zipf_fit" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(split(graft.ops.Dedup.normalizeText(col("text")),
          " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(200)
      // 200-row frame: the rank window is bounded by the limit above.
      val ranked = counts.withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      val pts = ranked.select(
        log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
      val terms = pts.select(
        round(col("x") * lit(1e12), 0).cast("long").as("xi"),
        round(col("y") * lit(1e12), 0).cast("long").as("yi"),
        round(col("x") * col("y") * lit(1e12), 0).cast("long").as("xyi"),
        round(col("x") * col("x") * lit(1e12), 0).cast("long").as("xxi"))
      val agg = terms.agg(count(lit(1)).as("n"), sum("xi").as("sx"),
        sum("yi").as("sy"), sum("xyi").as("sxy"), sum("xxi").as("sxx"))
      agg
        .withColumn("__slope",
          (col("n") * (col("sxy") / lit(1e12)) -
            (col("sx") / lit(1e12)) * (col("sy") / lit(1e12))) /
            (col("n") * (col("sxx") / lit(1e12)) -
              (col("sx") / lit(1e12)) * (col("sx") / lit(1e12))))
        .select(col("n").as("n_terms"),
          round(col("__slope"), 6).as("slope"),
          round((col("sy") / lit(1e12) - col("__slope") *
            (col("sx") / lit(1e12))) / col("n"), 6).as("intercept"))
    }),

    // Token-WEIGHTED length quantiles (inverted CDF): "the median
    // document BY TOKEN MASS" — a few giant docs hold a large share of
    // the training tokens, so the weighted median sits far above the
    // plain one. Distributed rank selection over the distinct-value
    // table: per-tile weight sums -> driver base offsets -> cumulative
    // window in only the target tiles. Integer weights end to end.
    "q_weighted_quantiles" -> ((s, dir) => {
      val probs = Seq(0.25, 0.5, 0.75, 0.9)
      val docs = Tables.documents(s, dir)
        .withColumn("__w", graft.text.TextFunctions.tokenCount(col("text")))
      val qs = graft.ops.Quantiles.weightedQuantiles(
        docs, "n_chars", "__w", probs)
      import s.implicits._
      probs.zip(qs).map { case (p, v) => (p, v.toLong) }
        .toDF("p", "n_chars_at")
    }),

    // ROUGE-1/2 recall + BLEU-1/2 precision between consecutive doc
    // pairs (ref = doc_id d, cand = d+1): clipped n-gram overlap
    // Σ min(c_ref, c_cand) per PAIR — the multiset ("clipped count")
    // definition from the ROUGE/BLEU papers, not the set variant —
    // plus the BLEU-2 composite with its brevity penalty. All counts
    // integer; every ratio is one division of exact integers.
    "q_rouge_bleu" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      def counts(n: Int): DataFrame = docs
        .select(col("doc_id"),
          explode(graft.expr.WordShingles.shingles(col("text"), n)).as("g"))
        .filter(col("g") =!= "")
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val pairs = docs.select(col("doc_id").as("doc_ref"),
          (col("doc_id") + 1).as("doc_cand"))
        .join(docs.select(col("doc_id").as("doc_cand")), Seq("doc_cand"))
        .select("doc_ref", "doc_cand")
      def overlap(c: DataFrame, out: String): DataFrame = c
        .select(col("doc_id").as("doc_ref"), col("g"), col("c").as("ca"))
        .join(c.select((col("doc_id") - 1).as("doc_ref"), col("g"),
          col("c").as("cb")), Seq("doc_ref", "g"))
        .groupBy("doc_ref")
        .agg(sum(least(col("ca"), col("cb"))).as(out))
      def totals(c: DataFrame, out: String): DataFrame =
        c.groupBy("doc_id").agg(sum(col("c")).as(out))
      val c1 = counts(1).localCheckpoint(eager = false)
      val c2 = counts(2).localCheckpoint(eager = false)
      val joined = pairs
        .join(overlap(c1, "ov1"), Seq("doc_ref"), "left")
        .join(overlap(c2, "ov2"), Seq("doc_ref"), "left")
        .join(totals(c1, "tr1").withColumnRenamed("doc_id", "doc_ref"),
          Seq("doc_ref"), "left")
        .join(totals(c2, "tr2").withColumnRenamed("doc_id", "doc_ref"),
          Seq("doc_ref"), "left")
        .join(totals(c1, "tc1").withColumnRenamed("doc_id", "doc_cand"),
          Seq("doc_cand"), "left")
        .join(totals(c2, "tc2").withColumnRenamed("doc_id", "doc_cand"),
          Seq("doc_cand"), "left")
      def ratio(num: org.apache.spark.sql.Column,
          den: org.apache.spark.sql.Column) =
        when(den > 0, coalesce(num, lit(0L)).cast("double") /
          den.cast("double"))
      val p1 = ratio(col("ov1"), col("tc1"))
      val p2 = ratio(col("ov2"), col("tc2"))
      val bp = when(col("tc1") >= col("tr1"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("tr1").cast("double") / col("tc1").cast("double")))
      joined.select(col("doc_ref"), col("doc_cand"),
        round(ratio(col("ov1"), col("tr1")), 6).as("rouge1"),
        round(ratio(col("ov2"), col("tr2")), 6).as("rouge2"),
        round(p1, 6).as("prec1"),
        round(p2, 6).as("prec2"),
        when(p1 > 0 && p2 > 0, round(bp * sqrt(p1 * p2), 6))
          .otherwise(lit(0.0)).as("bleu2"))
    }))

  val oracles: Map[String, String] = Map(
    "q_vocab_growth" ->
      s"""WITH bounds AS (
         |  SELECT min(doc_id) AS lo, max(doc_id) + 1 AS hi FROM documents),
         |toks AS (
         |  SELECT doc_id, unnest(${OracleSql.toksSql}) AS tok FROM documents),
         |t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
         |occ AS (
         |  SELECT ((doc_id - lo) * 10) // (hi - lo) AS bucket,
         |    count(*) AS n_tokens
         |  FROM t, bounds GROUP BY 1),
         |fst AS (SELECT tok, min(doc_id) AS fd FROM t GROUP BY 1),
         |fresh AS (
         |  SELECT ((fd - lo) * 10) // (hi - lo) AS bucket,
         |    count(*) AS new_types
         |  FROM fst, bounds GROUP BY 1)
         |SELECT CAST(bucket AS INT) AS bucket,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(new_types, 0) AS BIGINT) AS new_types,
         |  CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
         |  CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY bucket) AS BIGINT)
         |    AS cum_types
         |FROM occ LEFT JOIN fresh USING (bucket)""".stripMargin,

    "q_zipf_fit" ->
      s"""WITH toks AS (
         |  SELECT unnest(${OracleSql.toksSql}) AS tok FROM documents),
         |cnt AS (
         |  SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY 1),
         |top AS (
         |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
         |  FROM cnt ORDER BY cnt DESC, tok LIMIT 200),
         |pts AS (
         |  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
         |  FROM top),
         |terms AS (
         |  SELECT CAST(round(x * 1e12, 0) AS BIGINT) AS xi,
         |    CAST(round(y * 1e12, 0) AS BIGINT) AS yi,
         |    CAST(round(x * y * 1e12, 0) AS BIGINT) AS xyi,
         |    CAST(round(x * x * 1e12, 0) AS BIGINT) AS xxi
         |  FROM pts),
         |agg AS (
         |  SELECT count(*) AS n, sum(xi) AS sx, sum(yi) AS sy,
         |    sum(xyi) AS sxy, sum(xxi) AS sxx
         |  FROM terms),
         |sl AS (
         |  SELECT n, sx, sy,
         |    (n * (sxy / 1e12) - (sx / 1e12) * (sy / 1e12)) /
         |    (n * (sxx / 1e12) - (sx / 1e12) * (sx / 1e12)) AS slope_raw
         |  FROM agg)
         |SELECT CAST(n AS BIGINT) AS n_terms,
         |  round(slope_raw, 6) AS slope,
         |  round((sy / 1e12 - slope_raw * (sx / 1e12)) / n, 6) AS intercept
         |FROM sl""".stripMargin,

    // Same distinct-value collapse, same greatest(1, ceil(p·W)) targets;
    // the tiling is invisible to the answer (tile-local cumulatives plus
    // exclusive bases == one global cumulative window).
    "q_weighted_quantiles" ->
      """WITH t AS (
        |  SELECT n_chars AS x,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS w
        |  FROM documents),
        |d AS (SELECT x, CAST(sum(w) AS BIGINT) AS w FROM t
        |      WHERE w > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM d),
        |c AS (SELECT x, CAST(sum(w) OVER (ORDER BY x) AS BIGINT) AS cw
        |      FROM d),
        |probs(p) AS (VALUES (0.25::DOUBLE), (0.5::DOUBLE),
        |  (0.75::DOUBLE), (0.9::DOUBLE))
        |SELECT p, (SELECT min(x) FROM c, tot
        |  WHERE cw >= greatest(1, CAST(ceiling(p * tw) AS BIGINT)))
        |  AS n_chars_at
        |FROM probs""".stripMargin,

    "q_rouge_bleu" ->
      s"""WITH u1 AS (
         |  SELECT doc_id, unnest(${OracleSql.shinglesSqlN(1)}) AS g
         |  FROM documents),
         |c1 AS (SELECT doc_id, g, count(*) AS c FROM u1 WHERE g <> ''
         |       GROUP BY 1, 2),
         |u2 AS (
         |  SELECT doc_id, unnest(${OracleSql.shinglesSqlN(2)}) AS g
         |  FROM documents),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM u2 WHERE g <> ''
         |       GROUP BY 1, 2),
         |t1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM c1 GROUP BY 1),
         |t2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM c2 GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_ref, b.doc_id AS doc_cand
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         |ov1 AS (
         |  SELECT a.doc_id AS doc_ref, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
         |  FROM c1 a JOIN c1 b ON b.doc_id = a.doc_id + 1 AND b.g = a.g
         |  GROUP BY 1),
         |ov2 AS (
         |  SELECT a.doc_id AS doc_ref, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
         |  FROM c2 a JOIN c2 b ON b.doc_id = a.doc_id + 1 AND b.g = a.g
         |  GROUP BY 1)
         |SELECT p.doc_ref, p.doc_cand,
         |  CASE WHEN tr1.t > 0
         |    THEN round(coalesce(ov1.ov, 0) / CAST(tr1.t AS DOUBLE), 6) END
         |    AS rouge1,
         |  CASE WHEN tr2.t > 0
         |    THEN round(coalesce(ov2.ov, 0) / CAST(tr2.t AS DOUBLE), 6) END
         |    AS rouge2,
         |  CASE WHEN tc1.t > 0
         |    THEN round(coalesce(ov1.ov, 0) / CAST(tc1.t AS DOUBLE), 6) END
         |    AS prec1,
         |  CASE WHEN tc2.t > 0
         |    THEN round(coalesce(ov2.ov, 0) / CAST(tc2.t AS DOUBLE), 6) END
         |    AS prec2,
         |  CASE WHEN coalesce(ov1.ov, 0) > 0 AND tc1.t > 0
         |      AND coalesce(ov2.ov, 0) > 0 AND tc2.t > 0
         |    THEN round(
         |      (CASE WHEN tc1.t >= tr1.t THEN 1.0
         |            ELSE exp(1.0 - CAST(tr1.t AS DOUBLE) / CAST(tc1.t AS DOUBLE))
         |       END) *
         |      sqrt((coalesce(ov1.ov, 0) / CAST(tc1.t AS DOUBLE)) *
         |           (coalesce(ov2.ov, 0) / CAST(tc2.t AS DOUBLE))), 6)
         |    ELSE 0.0 END AS bleu2
         |FROM pairs p
         |LEFT JOIN ov1 ON ov1.doc_ref = p.doc_ref
         |LEFT JOIN ov2 ON ov2.doc_ref = p.doc_ref
         |LEFT JOIN t1 tr1 ON tr1.doc_id = p.doc_ref
         |LEFT JOIN t2 tr2 ON tr2.doc_id = p.doc_ref
         |LEFT JOIN t1 tc1 ON tc1.doc_id = p.doc_cand
         |LEFT JOIN t2 tc2 ON tc2.doc_id = p.doc_cand""".stripMargin)
}

package graft.queries

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Deduplication operator family over `documents` (north-star LLM-pipeline
  * surface): exact hash-dedup, n-gram Jaccard, SimHash, MinHash+LSH.
  *
  * Oracle notes: xxhash64 has no DuckDB equivalent, so the oracle-checked
  * SimHash and MinHash/LSH queries run md5-derived hash variants
  * ([[Dedup.simHashMd5]], [[Dedup.md5MinHashSignatures]]) that DuckDB replicates
  * bit-for-bit; prod paths and the property specs stay on xxhash64.
  */
object DedupQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // Exact content dedup: survivors (min doc_id per normalized digest).
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactByDigest(Tables.documents(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Exact n-gram (3-shingle) Jaccard over source-blocked pairs: the
    // classic blocking trick — candidates share a blocking key (here the
    // `source` column), which turns the O(n²) cross join into per-block
    // joins that shuffle on the key. The LSH query below is the fully
    // content-derived blocking variant. maxDf = 2 exercises the 100 TB
    // stop-shingle cap (a ubiquitous shingle fans out O(df²) pairs) under
    // the oracle gate — jaccard is then over the capped shingle universe.
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardSparse(Tables.documents(s, dir), "doc_id", "text", 3,
        blockCol = Some("source"), maxDf = Some(2))
        .filter(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),

    // SimHash (md5-bit variant) per document.
    "q_dedup_simhash" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.simHashMd5(col("text")).as("simhash"))
    }),

    // MinHash-LSH candidate pairs, md5 double-hash variant so DuckDB can
    // replicate the banded self-join bit-for-bit (prod paths — and the
    // property specs — stay on the xxhash64 signatures).
    "q_dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.md5MinHashCandidates(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8)
        .select(col("id_a"), col("id_b"), round(col("jaccard_est"), 4).as("jaccard_est"))
    }),

    // Candidate pairs → duplicate CLUSTERS: large-star/small-star connected
    // components over the MinHash-LSH pair graph. The component id (the
    // cluster's min doc_id) is what a keep-one-per-cluster dedup keys on.
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.md5MinHashCandidates(Tables.documents(s, dir), "doc_id",
        "text", shingleSize = 3, numHashes = 16, bands = 8)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }),

    // Content-defined-chunking dedup over BINARY payloads (FastCDC gear
    // hash): each doc's UTF-8 bytes chunk at content-derived boundaries,
    // then chunk-hash document frequency gives per-doc shared-bytes
    // ratios — the shift-resistant storage-dedup signal for blobs where
    // token shingles don't apply. ORACLE-GATED: avgBits=5 makes the cut
    // test a function of the last 5 bytes only, so DuckDB replays the
    // boundary chain exactly (see cdcDedupSql); CdcChunksSpec pins
    // tiling, bounds, shift-resilience, and determinism.
    "q_cdc_dedup" -> ((s, dir) => {
      val chunks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.expr.CdcChunks.chunks(col("text").cast("binary"),
            minSize = 24, avgBits = 5, maxSize = 192)).as("c"))
        .select(col("doc_id"), col("c.hash").as("h"),
          col("c.length").cast("long").as("len"))
        .localCheckpoint(false) // referenced by both the df and the rollup
      val docFreq = chunks.select(col("h"), col("doc_id")).distinct()
        .groupBy("h").agg(count(lit(1)).as("__df"))
      chunks.join(docFreq, Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("len")).as("total_bytes"),
          sum(when(col("__df") > 1, col("len")).otherwise(0L))
            .as("shared_bytes"))
    }),

    // Benchmark decontamination: docs with doc_id % 10 == 0 stand in as the
    // eval/benchmark corpus; every remaining (training) doc is flagged with
    // its count of distinct eval 5-grams. The Bloom prefilter (the 100 TB
    // path — eval n-gram hashes as a broadcast bit array pruning the
    // train-side explode before the join) is ON here: it has no false
    // negatives and false positives are re-checked by the exact semi-join,
    // so the gated result is identical with or without it.
    "q_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Decontaminate.flagContaminated(
        train = docs.filter(col("doc_id") % 10 =!= 0),
        eval = docs.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text",
        n = 5, bloomPrefilter = true, estEvalNgrams = 1L << 16)
        .select(col("doc_id"), col("n_eval_ngrams"), col("contaminated"))
    }),

    // FUZZY decontamination: train docs that are MinHash-LSH near-dups of
    // any eval doc (same eval split as q_decontaminate) at estimated
    // Jaccard >= 0.5 — catches paraphrased/reformatted benchmark leakage
    // the exact 5-gram test misses. Banded bucket join, never all-pairs;
    // md5 signature family for oracle parity.
    "q_fuzzy_decontam" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Decontaminate.flagFuzzy(
        train = docs.filter(col("doc_id") % 10 =!= 0),
        eval = docs.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text",
        shingleSize = 3, numHashes = 16, bands = 8, minJaccard = 0.5)
        .select(col("doc_id"), col("n_eval_neardups"),
          round(col("max_jaccard"), 4).as("max_jaccard"),
          col("fuzzy_contaminated"))
    }),

    // Winnowing fingerprint density (SIGMOD'03 / MOSS): rightmost-min
    // hash per 4-gram window over char 8-grams, encoded into one sortable
    // key so a plain windowed min does the selection.
    "q_winnowing" -> ((s, dir) =>
      graft.text.Winnowing.profile(Tables.documents(s, dir), "doc_id", "text",
        k = 8, w = 4)),

    // Incremental-ingest near-dup gate: candidate pairs BETWEEN a batch
    // (doc_id % 10 == 0) and the standing corpus — no corpus self-pairs.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.md5MinHashCandidatesAgainst(
        batch = docs.filter(col("doc_id") % 10 === 0),
        corpus = docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", shingleSize = 3, numHashes = 16, bands = 8)
        .select(col("id_batch"), col("id_corpus"),
          round(col("jaccard_est"), 4).as("jaccard_est"))
    }),

    // Corpus-level duplicate 13-gram fraction (Gopher-style cross-document
    // signal; docs under 13 tokens have no grams and drop out).
    "q_dup_ngrams" -> ((s, dir) => {
      Dedup.dupNgramFraction(Tables.documents(s, dir), "doc_id", "text", 13)
    }),

    // Clusters + quality → the curated verdict: every doc tagged with its
    // cluster and whether it is the cluster's best copy (max n_chars, ties
    // to the larger doc_id). Singletons keep themselves.
    "q_dedup_keepbest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.md5MinHashCandidates(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8)
      Dedup.clusterRepresentatives(docs, "doc_id", "n_chars",
        pairs, "id_a", "id_b")
    }),

    // C4-style corpus line dedup (text.LineDedup): the synthetic corpus
    // has no natural lines, so the planted-data pattern applies — docs
    // are chunked into 12-token lines and boilerplate lines are planted
    // deterministically from doc_id (doc_id%3 prepends a newsletter line,
    // doc_id%5 appends a footer), identically in the oracle. Keep-first
    // then reassembles every doc from its surviving lines.
    "q_line_dedup" -> ((s, dir) => {
      val toks = split(Dedup.normalizeText(col("text")), " ")
      val nLines = floor((size(toks) + lit(11)) / lit(12)).cast("int")
      val chunks = transform(sequence(lit(0), nLines - lit(1)),
        i => array_join(slice(toks, i * lit(12) + lit(1), lit(12)), " "))
      val noLines = array().cast("array<string>")
      val planted = concat(
        when(col("doc_id") % 3 === 0,
          array(lit("subscribe to our newsletter today"))).otherwise(noLines),
        chunks,
        when(col("doc_id") % 5 === 0,
          array(lit("all rights reserved by the site"))).otherwise(noLines))
      val withLines = Tables.documents(s, dir)
        .select(col("doc_id"), array_join(planted, "\n").as("text"))
      graft.text.LineDedup.keepFirst(withLines, "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("n_kept"), col("n_dropped"))
    }),

    // Dedup-quality eval harness: MinHash-LSH candidate pairs scored
    // against exact-Jaccard (τ=0.5) ground truth — the
    // precision/recall QA gate a pipeline runs before trusting its
    // probabilistic dedup at scale. Truth comes from the prefix-filtered
    // exact join (ops.SetSimJoin), predictions from the banded LSH;
    // anti/inner joins produce the confusion counts in one pass each.
    //
    // The eval runs on a deterministic 1-in-3 SAMPLE of the corpus
    // (doc_id % 3) — the confusion matrix is exact OVER THE SAMPLE, which
    // is what a QA gate needs, while the exact-truth side's inherently
    // near-quadratic verification work shrinks ~9×. At production scale
    // the sample fraction is the knob that keeps the gate affordable: the
    // truth side is the one computation in the dedup family that cannot
    // be made subquadratic without becoming the thing it is auditing.
    "q_dedup_eval" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") % 3 === 0)
      val pred = Dedup.md5MinHashCandidates(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 16, bands = 8)
        .select(col("id_a"), col("id_b"))
      val truth = graft.ops.SetSimJoin.selfJoin(docs, "doc_id", "text",
          shingleSize = 3, tau = 0.5)
        .select(col("id_a"), col("id_b"))
      // One full-outer join yields the whole confusion matrix: each side's
      // expensive lineage (banded LSH; prefix-filtered exact join) is
      // evaluated ONCE, where the semi/anti/anti formulation re-ran truth
      // and pred three times each.
      val confusion = truth.withColumn("__t", lit(1))
        .join(pred.withColumn("__p", lit(1)), Seq("id_a", "id_b"), "full_outer")
        .agg(
          count(when(col("__t").isNotNull && col("__p").isNotNull, 1)).as("tp"),
          count(when(col("__p").isNull, 1)).as("fn"),
          count(when(col("__t").isNull, 1)).as("fp"))
      confusion
        .select(col("tp"), col("fn"), col("fp"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 4)
            .as("recall"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 4)
            .as("precision"))
    }),

    // AllPairs/PPJoin prefix-filtered EXACT Jaccard self-join
    // (ops.SetSimJoin): the prefix filter is lossless, so the oracle is
    // the naive all-pairs computation — same pairs, same exact jaccard.
    "q_setsim_join" -> ((s, dir) => {
      graft.ops.SetSimJoin.selfJoin(Tables.documents(s, dir),
          "doc_id", "text", shingleSize = 3, tau = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),

    // ExactSubstr duplicated-SPAN removal (text.DupSpans, Lee et al.
    // 2022): 13-token windows repeated anywhere in the corpus mark their
    // coverage, marked windows merge into maximal spans (islands), spans
    // are excised and the doc rebuilt. md5 of the rebuilt text pins the
    // exact span boundaries — off-by-one in the merge breaks the hash.
    "q_dup_spans" -> ((s, dir) => {
      graft.text.DupSpans.removeDuplicatedSpans(
          Tables.documents(s, dir), "doc_id", "text", L = 13)
        .select(col("doc_id"), col("n_tokens"), col("n_spans"),
          col("n_removed"), col("dup_frac"), md5(col("clean")).as("clean_md5"))
    }))

  import OracleSql.{toksSql, shinglesSqlN}

  private val shinglesSql = shinglesSqlN(3)

  private val simhashBitsSql: String = {
    val bits = (0 until 60).map { i =>
      s"(CASE WHEN 2 * len(list_filter(__hs, h -> (h >> $i) & 1 = 1)) >= len(__hs)" +
        s" THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)"
    }
    bits.mkString(" | ")
  }

  /** DuckDB replay of the FastCDC boundary scan (expr/CdcChunks.scala)
    * for avgBits = 5, minSize = 24, maxSize = 192.
    *
    * Why this is SQL-expressible at all: the rolling gear hash is
    * `h = (h << 1) + gear(byte)`, so bit b of h after byte i only sees
    * gear contributions from bytes i-b..i — the cut test `(h & 31) == 0`
    * is a function of the LAST 5 BYTES alone (minSize 24 ≥ 5 keeps the
    * window inside the current chunk). Cut candidates therefore
    * precompute position-locally with window lags; the sequential
    * boundary chain (each chunk starts where the previous ended) is a
    * recursive CTE over "next cut at or after p". Chunk identity uses
    * content equality, which agrees with the engine's fnv64 identity
    * short of a 64-bit collision (none at fixture scale, and the data is
    * fixed). ASCII corpus ⇒ ascii(char) == byte; the engine side hashes
    * the UTF-8 bytes, so a non-ASCII fixture would need encode()-based
    * byte extraction here.
    */
  private def cdcDedupSql: String = {
    val g32 = graft.expr.CdcChunks.gearLow(5)
    val vals = g32.zipWithIndex.map { case (g, b) => s"($b, $g)" }.mkString(", ")
    // Chunk end for a chunk starting at r.s: first hash cut at i >= s+23,
    // else the forced max cut s+191, else end of doc. Appears twice (the
    // recursion emits starts; the chunk table recomputes ends).
    val endExpr = "least(coalesce(p.nxt, 1000000000), r.s + 191, d.n - 1)"
    s"""WITH RECURSIVE
       |gt(b, g) AS (VALUES $vals),
       |dl AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |ps AS (
       |  SELECT d.doc_id, CAST(i AS INT) AS pos,
       |    ascii(substring(d.text, CAST(i + 1 AS INT), 1)) AS byte
       |  FROM dl d, range(0, 1000000) t(i) WHERE i < d.n),
       |cp AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos >= 4 AND
       |      (g + 2 * lag(g, 1) OVER w + 4 * lag(g, 2) OVER w
       |         + 8 * lag(g, 3) OVER w + 16 * lag(g, 4) OVER w) % 32 = 0
       |    THEN pos END AS cutpos
       |  FROM ps JOIN gt ON gt.b = ps.byte
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |nc AS (
       |  SELECT doc_id, pos,
       |    min(cutpos) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
       |  FROM cp),
       |st(doc_id, s) AS (
       |  -- No seed chunk for empty/null docs: the engine emits zero
       |  -- chunks for them, so the doc must be absent here too.
       |  SELECT doc_id, 0 FROM dl WHERE n > 0
       |  UNION ALL
       |  SELECT r.doc_id, $endExpr + 1
       |  FROM st r
       |  JOIN dl d ON d.doc_id = r.doc_id
       |  LEFT JOIN nc p ON p.doc_id = r.doc_id AND p.pos = r.s + 23
       |  WHERE $endExpr + 1 <= d.n - 1),
       |chk AS (
       |  SELECT r.doc_id,
       |    substring(d.text, r.s + 1, $endExpr - r.s + 1) AS content,
       |    CAST($endExpr - r.s + 1 AS BIGINT) AS len
       |  FROM st r
       |  JOIN dl d ON d.doc_id = r.doc_id
       |  LEFT JOIN nc p ON p.doc_id = r.doc_id AND p.pos = r.s + 23),
       |df AS (SELECT content, count(DISTINCT doc_id) AS ddf FROM chk GROUP BY content)
       |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(c.len) AS BIGINT) AS total_bytes,
       |  CAST(sum(CASE WHEN f.ddf > 1 THEN c.len ELSE 0 END) AS BIGINT) AS shared_bytes
       |FROM chk c JOIN df f ON f.content = c.content
       |GROUP BY c.doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // FastCDC boundaries replayed from the low-5-bit locality of the
    // gear hash + a recursive boundary chain (see cdcDedupSql).
    "q_cdc_dedup" -> cdcDedupSql,

    // Same key encoding, same ROWS window, same full-window gate.
    "q_winnowing" ->
      """WITH nrm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, pr.pos AS pos,
        |    (CAST(('0x' || substr(md5(pr.g), 1, 15)) AS BIGINT) % 1099511627776)
        |      * 2097152 + (2097151 - pr.pos) AS key
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(0, len(t) - 8 + 1),
        |      i -> struct_pack(pos := i, g := substr(t, i + 1, 8)))) AS pr
        |    FROM nrm WHERE len(t) >= 8)),
        |f AS (
        |  SELECT doc_id, pos, min(key) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
        |  FROM g),
        |ng AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
        |nf AS (SELECT doc_id, count(DISTINCT fp // 2097152) AS n_fingerprints
        |       FROM f WHERE pos >= 3 GROUP BY 1)
        |SELECT ng.doc_id, ng.n_grams,
        |  CAST(COALESCE(nf.n_fingerprints, 0) AS BIGINT) AS n_fingerprints
        |FROM ng LEFT JOIN nf USING (doc_id)""".stripMargin,
    // Same chunking, same plants, same first-wins arbitration and
    // chr(10) reassembly — text compared via md5.
    "q_line_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT doc_id,
         |  list_transform(range(0, (len(toks) + 11) // 12), i ->
         |    array_to_string(list_slice(toks, i*12+1, i*12+12), ' ')) AS ls
         |  FROM t),
         |p AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN ['subscribe to our newsletter today']
         |       ELSE CAST([] AS VARCHAR[]) END
         |  || ls ||
         |  CASE WHEN doc_id % 5 = 0 THEN ['all rights reserved by the site']
         |       ELSE CAST([] AS VARCHAR[]) END AS ls
         |  FROM c),
         |l0 AS (SELECT doc_id, unnest(ls) AS line,
         |         generate_subscripts(ls, 1) AS pos FROM p),
         |l AS (SELECT * FROM l0 WHERE line <> ''),
         |k AS (SELECT doc_id, pos, line,
         |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1
         |          AS keep
         |      FROM l)
         |SELECT doc_id,
         |  md5(nullif(string_agg(line, chr(10) ORDER BY pos)
         |    FILTER (WHERE keep), '')) AS text_md5,
         |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
         |FROM k GROUP BY doc_id""".stripMargin,
    // LSH candidates (banded-signature CTEs as q_dedup_minhash_lsh) vs
    // naive exact-Jaccard truth at τ=0.5, reduced to confusion counts.
    // Same deterministic 1-in-3 sample as the Spark side.
    "q_dedup_eval" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS s FROM documents
         |  WHERE doc_id % 3 = 0),
         |hx AS (
         |  SELECT doc_id, list_transform(s, x -> md5(x)) AS hexes
         |  FROM sh WHERE len(s) > 0),
         |hs AS (
         |  SELECT doc_id,
         |    list_transform(hexes, h ->
         |      CAST(('0x' || substr(h, 1, 15)) AS BIGINT)
         |        % 288230376151711744) AS h1,
         |    list_transform(hexes, h ->
         |      CAST(('0x' || substr(h, 16, 15)) AS BIGINT)
         |        % 288230376151711744) AS h2
         |  FROM hx),
         |sig AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 16),
         |      s -> list_min(list_transform(range(1, len(h1) + 1),
         |        i -> h1[i] + s * h2[i]))) AS sig
         |  FROM hs),
         |banded AS (
         |  SELECT doc_id, b,
         |    array_to_string(list_transform(list_slice(sig, b * 2 + 1, b * 2 + 2),
         |      v -> CAST(v AS VARCHAR)), ',') AS bucket
         |  FROM sig, range(0, 8) t(b)),
         |pred AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bucket = b2.bucket
         |  WHERE a.doc_id < b2.doc_id),
         |el AS (SELECT DISTINCT doc_id, unnest(list_distinct(s)) AS g
         |       FROM sh WHERE len(s) > 0),
         |sz AS (SELECT doc_id, count(*) AS n FROM el GROUP BY 1),
         |ip AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM el a JOIN el b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT id_a, id_b FROM ip
         |  JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.5),
         |c AS (
         |  SELECT
         |    CAST((SELECT count(*) FROM truth JOIN pred USING (id_a, id_b))
         |      AS BIGINT) AS tp,
         |    CAST((SELECT count(*) FROM truth ANTI JOIN pred USING (id_a, id_b))
         |      AS BIGINT) AS fn,
         |    CAST((SELECT count(*) FROM pred ANTI JOIN truth USING (id_a, id_b))
         |      AS BIGINT) AS fp)
         |SELECT tp, fn, fp,
         |  round(CAST(tp AS DOUBLE) / (tp + fn), 4) AS recall,
         |  round(CAST(tp AS DOUBLE) / (tp + fp), 4) AS precision
         |FROM c""".stripMargin,

    // Same 13-token windows, same md5-prefix keys, same islands merge
    // (lag default −L−1 ⇒ first marked start always opens a span), same
    // ordered reassembly.
    "q_dup_spans" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSqlN(13)} AS sl FROM documents),
         |g AS (
         |  SELECT doc_id, generate_subscripts(sl, 1) - 1 AS pos,
         |    unnest(list_transform(sl, x -> substr(md5(x), 1, 16))) AS h
         |  FROM sh),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
         |m AS (SELECT doc_id, pos FROM g SEMI JOIN dup USING (h)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos, 1, -14)
         |      OVER (PARTITION BY doc_id ORDER BY pos) > 13
         |      THEN 1 ELSE 0 END AS nw
         |  FROM m),
         |isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS island
         |  FROM isl),
         |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 12 AS e
         |       FROM isl2 GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |          CAST(sum(e - s + 1) AS BIGINT) AS n_removed
         |        FROM sp GROUP BY 1),
         |tok AS (SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos,
         |          unnest(t) AS tk FROM toks),
         |kept AS (
         |  SELECT tok.doc_id, pos, tk FROM tok
         |  ANTI JOIN sp ON tok.doc_id = sp.doc_id
         |    AND tok.pos BETWEEN sp.s AND sp.e),
         |clean AS (
         |  SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS c
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  coalesce(a.n_spans, 0) AS n_spans,
         |  coalesce(a.n_removed, 0) AS n_removed,
         |  CASE WHEN len(t.t) > 0
         |    THEN round(coalesce(a.n_removed, 0) / CAST(len(t.t) AS DOUBLE), 4)
         |    ELSE 0.0 END AS dup_frac,
         |  md5(coalesce(c.c, '')) AS clean_md5
         |FROM toks t
         |LEFT JOIN agg a ON t.doc_id = a.doc_id
         |LEFT JOIN clean c ON t.doc_id = c.doc_id""".stripMargin,

    // Prefix filtering is an implementation detail — the oracle is the
    // naive distinct-shingle pair join with exact Jaccard.
    "q_setsim_join" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct($shinglesSql) AS s FROM documents),
         |e AS (
         |  SELECT DISTINCT doc_id, unnest(s) AS g FROM sh),
         |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT id_a, id_b,
         |    CAST(inter AS DOUBLE) / (x.n + y.n - inter) AS jaccard
         |  FROM pairs
         |  JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id)
         |SELECT id_a, id_b, round(jaccard, 4) AS jaccard
         |FROM j WHERE jaccard >= 0.2""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))""".stripMargin,
    // Mirrors ngramJaccardSparse(maxDf = 2): shingles with document
    // frequency > 2 within the source block are dropped BEFORE the pair
    // join; per-doc sizes are recomputed over the capped universe.
    "q_dedup_ngram_jaccard" ->
      s"""WITH ex AS (
         |  SELECT doc_id, source, unnest(list_distinct($shinglesSql)) AS sh
         |  FROM documents),
         |capped AS (
         |  SELECT doc_id, source, sh FROM (
         |    SELECT doc_id, source, sh,
         |      count(*) OVER (PARTITION BY source, sh) AS df FROM ex)
         |  WHERE df <= 2),
         |sized AS (
         |  SELECT doc_id, source, sh,
         |    count(*) OVER (PARTITION BY doc_id) AS n FROM capped),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         |    count(*) AS c
         |  FROM sized a JOIN sized b
         |    ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id_a, id_b, round(c / CAST(na + nb - c AS DOUBLE), 4) AS jaccard
         |FROM pairs WHERE c / CAST(na + nb - c AS DOUBLE) >= 0.2""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform($toksSql,
         |      t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS __hs
         |  FROM documents)
         |SELECT doc_id, $simhashBitsSql AS simhash FROM h""".stripMargin,
    // Mirrors Dedup.md5MinHashCandidates: Kirsch–Mitzenmacher family
    // h1 + s·h2 over the two 58-bit halves of ONE md5 per shingle; 16
    // min-hashes, 8 bands × 2 rows, raw joined-band join key.
    "q_dedup_minhash_lsh" ->
      s"""WITH $md5SigCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |    a.sig AS sa, b2.sig AS sb
         |  FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bucket = b2.bucket
         |  WHERE a.doc_id < b2.doc_id)
         |SELECT id_a, id_b,
         |  round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 4) AS jaccard_est
         |FROM pairs""".stripMargin,

    // Two-sided variant: same signature/band CTEs, bucket join restricted
    // to batch×corpus (no self-pairs, no a<b canonicalization — sides are
    // disjoint by construction).
    "q_dedup_incremental" ->
      s"""WITH $md5SigCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_batch, b2.doc_id AS id_corpus,
         |    a.sig AS sa, b2.sig AS sb
         |  FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bucket = b2.bucket
         |  WHERE a.doc_id % 10 = 0 AND b2.doc_id % 10 <> 0)
         |SELECT id_batch, id_corpus,
         |  round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 4)
         |    AS jaccard_est
         |FROM pairs""".stripMargin,
    // Same banded MinHash join as q_dedup_incremental with the
    // eval/train split, thresholded at estimated Jaccard >= 0.5 and
    // rolled up per train doc; zero-shingle docs fall out of the pair
    // CTEs on both engines and land as clean rows via the outer join.
    "q_fuzzy_decontam" ->
      s"""WITH $md5SigCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_eval, b2.doc_id AS id_train,
         |    a.sig AS sa, b2.sig AS sb
         |  FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bucket = b2.bucket
         |  WHERE a.doc_id % 10 = 0 AND b2.doc_id % 10 <> 0),
         |scored AS (
         |  SELECT id_train,
         |    len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0 AS j
         |  FROM pairs),
         |hits AS (
         |  SELECT id_train, count(*) AS n, max(j) AS mj
         |  FROM scored WHERE j >= 0.5 GROUP BY 1)
         |SELECT d.doc_id, coalesce(h.n, 0) AS n_eval_neardups,
         |  round(coalesce(h.mj, 0.0), 4) AS max_jaccard,
         |  coalesce(h.n, 0) > 0 AS fuzzy_contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.id_train
         |WHERE d.doc_id % 10 <> 0""".stripMargin,

    // Exact n-gram-overlap decontamination: the Bloom prefilter on the
    // Spark side is invisible to the result (no false negatives; positives
    // re-checked), so the oracle is the plain distinct-5-gram semi-join.
    "q_decontaminate" ->
      s"""WITH ev AS (
         |  SELECT DISTINCT unnest(${shinglesSqlN(5)}) AS sh
         |  FROM documents WHERE doc_id % 10 = 0),
         |tr AS (
         |  SELECT doc_id, unnest(list_distinct(${shinglesSqlN(5)})) AS sh
         |  FROM documents WHERE doc_id % 10 <> 0),
         |hits AS (
         |  SELECT doc_id, count(*) AS n FROM tr
         |  WHERE sh IN (SELECT sh FROM ev) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(h.n, 0) AS n_eval_ngrams,
         |  coalesce(h.n, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % 10 <> 0""".stripMargin,

    // Min-reachable-label via recursive CTE over the same MinHash pair
    // graph — the oracle for the large-star/small-star component ids.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE mh AS ($minhashPairsSql),
         |sym AS (
         |  SELECT id_a AS u, id_b AS v FROM mh
         |  UNION SELECT id_b, id_a FROM mh),
         |walk(id, comp) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM sym) n
         |  UNION
         |  SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.id)
         |SELECT id, CAST(min(comp) AS BIGINT) AS component
         |FROM walk GROUP BY id""".stripMargin,

    // Same component CTE extended with the per-cluster arg-max: best copy
    // = (n_chars, doc_id) lexicographic max, singletons self-clustered.
    "q_dedup_keepbest" ->
      s"""WITH RECURSIVE mh AS ($minhashPairsSql),
         |sym AS (
         |  SELECT id_a AS u, id_b AS v FROM mh
         |  UNION SELECT id_b, id_a FROM mh),
         |walk(id, comp) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM sym) n
         |  UNION
         |  SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.id),
         |comp AS (SELECT id, CAST(min(comp) AS BIGINT) AS component
         |         FROM walk GROUP BY id),
         |wc AS (
         |  SELECT d.doc_id, d.n_chars,
         |    COALESCE(c.component, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY n_chars DESC, doc_id DESC) = 1 AS keep
         |FROM wc""".stripMargin,

    // Distinct 13-grams, document frequency, per-doc duplicate fraction.
    "q_dup_ngrams" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(${shinglesSqlN(13)})) AS sh
         |  FROM documents),
         |dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_grams,
         |  round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
         |    / CAST(count(*) AS DOUBLE), 4) AS dup_frac
         |FROM sh JOIN dfreq USING (sh) GROUP BY doc_id""".stripMargin)

  /** ONE definition of the md5-MinHash signature chain (sh → banded):
    * the Kirsch–Mitzenmacher family h1 + s·h2 over the two 58-bit md5
    * halves, 16 min-hashes, 8 bands × 2 rows. Shared by every
    * banded-join oracle in this group so the signature arithmetic
    * cannot silently diverge between them.
    */
  private lazy val md5SigCtes: String =
    s"""sh AS (
       |  SELECT doc_id, $shinglesSql AS s FROM documents),
       |hx AS (
       |  SELECT doc_id, list_transform(s, x -> md5(x)) AS hexes
       |  FROM sh WHERE len(s) > 0),
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(hexes, h ->
       |      CAST(('0x' || substr(h, 1, 15)) AS BIGINT)
       |        % 288230376151711744) AS h1,
       |    list_transform(hexes, h ->
       |      CAST(('0x' || substr(h, 16, 15)) AS BIGINT)
       |        % 288230376151711744) AS h2
       |  FROM hx),
       |sig AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 16),
       |      s -> list_min(list_transform(range(1, len(h1) + 1),
       |        i -> h1[i] + s * h2[i]))) AS sig
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, sig, b,
       |    array_to_string(list_transform(list_slice(sig, b * 2 + 1, b * 2 + 2),
       |      v -> CAST(v AS VARCHAR)), ',') AS bucket
       |  FROM sig, range(0, 8) t(b))""".stripMargin

  /** The q_dedup_minhash_lsh pair body, shared by the cluster oracles. */
  private lazy val minhashPairsSql: String =
    s"""WITH $md5SigCtes
       |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bucket = b2.bucket
       |WHERE a.doc_id < b2.doc_id""".stripMargin
}

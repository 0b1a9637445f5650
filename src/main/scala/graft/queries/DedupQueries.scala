package graft.queries

import org.apache.spark.sql.functions._
import graft.Lake
import graft.operators.Dedup

/** Dedup operator inventory over `documents` (SURVEY.md §2b).
  *
  * The SQL-expressible forms (exact dedup, exact n-gram Jaccard) carry
  * DuckDB oracles; the hash-family methods (MinHash, SimHash) depend on
  * Spark's xxhash64 and are declared rows-only — but their *verification*
  * stage is the oracled Jaccard, so their correctness is still pinned in
  * the test suite by containment/recall assertions against `d3`.
  */
object DedupQueries {

  val defs: Map[String, Q] = Map(

    // ---- exact dedup, deterministic survivor ---------------------------
    "d1_dedup_exact" -> Q(
      (s, dir) => Dedup.dedupExact(Lake(s, dir).documents, Seq("text"), "doc_id")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin),

    // ---- MinHash + LSH near-dup pairs (banded, then exact-verified) ----
    // Runs the portable Md5MinHash family (Kirsch–Mitzenmacher double
    // hashing off one md5 digest) so the DuckDB oracle rebuilds the 64
    // signature mins digit-for-digit and replays the banding as direct
    // signature-slice equality — the same playbook that oracled d4. The
    // xxhash64 family stays the scale default (same operator; DedupSpec
    // pins both families to the identical pair set on this corpus).
    // 8 rows/band: band fires at j^8, so the small-vocabulary corpus
    // (random-pair Jaccard ~0.3) yields ~0.07% false candidates instead
    // of ~1% at 4 rows/band — candidate volume, not hashing, is what
    // dominates LSH cost. Recall at the planted ~0.97 dups stays ~1.
    "d2_minhash_pairs" -> Q(
      (s, dir) => Dedup.minHashLshPairs(Lake(s, dir).documents,
          "doc_id", "text", shingleN = 3, numHashes = 64, bands = 8,
          threshold = 0.7, family = Dedup.Md5MinHash)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          |hv AS (
          |  SELECT doc_id,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i, 1)) - 1)
          |                   * CAST(pow(16, 15 - i) AS BIGINT)
          |                   for i in generate_series(1, 15)]) AS BIGINT) AS h1,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i + 15, 1)) - 1)
          |                   * CAST(pow(16, 14 - i) AS BIGINT)
          |                   for i in generate_series(1, 14)]) AS BIGINT) AS h2
          |  FROM (SELECT doc_id, md5(s) AS m FROM sh)
          |), mh AS (
          |  SELECT doc_id, j, min((h1 + j * h2) % 1152921504606846976) AS v
          |  FROM hv, generate_series(0, 63) AS g(j)
          |  GROUP BY doc_id, j
          |), sigs AS (SELECT doc_id, list(v ORDER BY j) AS sig FROM mh GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
          |  WHERE a.sig[1:8] = b.sig[1:8] OR a.sig[9:16] = b.sig[9:16]
          |     OR a.sig[17:24] = b.sig[17:24] OR a.sig[25:32] = b.sig[25:32]
          |     OR a.sig[33:40] = b.sig[33:40] OR a.sig[41:48] = b.sig[41:48]
          |     OR a.sig[49:56] = b.sig[49:56] OR a.sig[57:64] = b.sig[57:64]
          |), com AS (
          |  SELECT c.id_a, c.id_b, count(*) AS common
          |  FROM cand c
          |  JOIN sh a ON a.doc_id = c.id_a
          |  JOIN sh b ON b.doc_id = c.id_b AND a.s = b.s
          |  GROUP BY 1, 2)
          |SELECT c.id_a, c.id_b,
          |  round(common * 1.0 / (ca.n + cb.n - common), 5) AS jaccard
          |FROM com c
          |JOIN cnt ca ON ca.doc_id = c.id_a
          |JOIN cnt cb ON cb.doc_id = c.id_b
          |WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.7
          |ORDER BY id_a, id_b""".stripMargin),
      headline = true),

    // ---- exact n-gram Jaccard pairs (the SQL-checkable near-dup op) ----
    "d3_jaccard_pairs" -> Q(
      (s, dir) => Dedup.jaccardPairs(Lake(s, dir).documents,
          "doc_id", "text", shingleN = 3, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |-- the engine's maxShingleDf=1000 skew guard, mirrored: shingles in
          |-- >1000 docs carry no similarity signal and are dropped from BOTH
          |-- the join and the per-doc set sizes (exact metric over the
          |-- informative-shingle universe); sh/shg MATERIALIZE (multi-
          |-- referenced — DuckDB inlining re-expands the posting unnest)
          |), hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
          |), shg AS MATERIALIZED (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
          |pairs AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT id_a, id_b,
          |  round(common * 1.0 / (ca.n + cb.n - common), 5) AS jaccard
          |FROM pairs
          |JOIN cnt ca ON ca.doc_id = id_a
          |JOIN cnt cb ON cb.doc_id = id_b
          |WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8
          |ORDER BY id_a, id_b""".stripMargin)),

    // ---- SimHash near-dup pairs (banded Hamming join) ------------------
    // Runs with the portable md5-derived 60-bit token hash so the DuckDB
    // oracle can rebuild the identical bit signatures from md5 hex digits
    // and replay the exact Hamming filter over all pairs. The xxhash64
    // 64-bit form is the scale default (same operator, DedupSpec-pinned).
    "d4_simhash_pairs" -> Q(
      (s, dir) => Dedup.simHashPairs(Lake(s, dir).documents,
          "doc_id", "text", maxHamming = 6, numBits = 60,
          tokenHash = Dedup.md5Hash60)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
          |  FROM documents
          |), th AS (SELECT doc_id, md5(t) AS h FROM tok),
          |bw AS (
          |  SELECT doc_id, k,
          |    CASE WHEN ((strpos('0123456789abcdef', substr(h, 15 - k // 4, 1)) - 1)
          |               >> (k % 4)) & 1 = 1 THEN 1 ELSE -1 END AS w
          |  FROM th, unnest(generate_series(0, 59)) AS g(k)
          |), sb AS (
          |  SELECT doc_id, k, CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS bit
          |  FROM bw GROUP BY doc_id, k
          |), sigs AS (SELECT doc_id, list(bit ORDER BY k) AS bits FROM sb GROUP BY doc_id),
          |pairs AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |    CAST(list_sum([abs(a.bits[i] - b.bits[i])
          |                   for i in generate_series(1, 60)]) AS INTEGER) AS hamming
          |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
          |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
          |ORDER BY id_a, id_b""".stripMargin)),

    // ---- pairs -> dedup clusters (connected components) ----------------
    // Oracle: recursive-CTE reachability over the same pair list.
    "d5_dedup_clusters" -> Q(
      (s, dir) => Dedup.connectedComponents(
          Dedup.jaccardPairs(Lake(s, dir).documents, "doc_id", "text", 3, 0.8),
          "id_a", "id_b")
        .orderBy("doc_id"),
      Some(
        """WITH RECURSIVE tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |-- the engine's maxShingleDf=1000 skew guard, mirrored: shingles in
          |-- >1000 docs carry no similarity signal and are dropped from BOTH
          |-- the join and the per-doc set sizes (exact metric over the
          |-- informative-shingle universe); sh/shg MATERIALIZE (multi-
          |-- referenced — DuckDB inlining re-expands the posting unnest)
          |), hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
          |), shg AS MATERIALIZED (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT id_a, id_b FROM cand
          |  JOIN cnt ca ON ca.doc_id = id_a
          |  JOIN cnt cb ON cb.doc_id = id_b
          |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8),
          |edges AS (
          |  SELECT id_a AS a, id_b AS b FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |mins AS (SELECT a, min(b) AS mb FROM reach GROUP BY a)
          |SELECT a AS doc_id, least(a, mb) AS cluster_id FROM mins
          |ORDER BY doc_id""".stripMargin)),

    // ---- pairs -> clusters via large-star/small-star (O(log n) rounds) --
    // Same contract and oracle shape as d5; the alternating-star algebra
    // must land on identical min-label clusters.
    "d7_dedup_clusters_star" -> Q(
      (s, dir) => Dedup.connectedComponentsStar(
          Dedup.jaccardPairs(Lake(s, dir).documents, "doc_id", "text", 3, 0.8),
          "id_a", "id_b")
        .orderBy("doc_id"),
      Some(
        """WITH RECURSIVE tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |-- the engine's maxShingleDf=1000 skew guard, mirrored: shingles in
          |-- >1000 docs carry no similarity signal and are dropped from BOTH
          |-- the join and the per-doc set sizes (exact metric over the
          |-- informative-shingle universe); sh/shg MATERIALIZE (multi-
          |-- referenced — DuckDB inlining re-expands the posting unnest)
          |), hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
          |), shg AS MATERIALIZED (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT id_a, id_b FROM cand
          |  JOIN cnt ca ON ca.doc_id = id_a
          |  JOIN cnt cb ON cb.doc_id = id_b
          |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8),
          |edges AS (
          |  SELECT id_a AS a, id_b AS b FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |mins AS (SELECT a, min(b) AS mb FROM reach GROUP BY a)
          |SELECT a AS doc_id, least(a, mb) AS cluster_id FROM mins
          |ORDER BY doc_id""".stripMargin)),

    // ---- end-to-end near-dedup: corpus minus non-representatives -------
    // 16 bands x 4 rows: the band fires at j^4, so a threshold-0.8 pair
    // misses with probability (1-j^4)^16 <= 2e-4 — recall holds at every
    // driver SF (8x8 banding lost borderline j~0.85 pairs at sf0.1 and
    // diverged from this exact recursive-CTE oracle; DedupSpec pins
    // lsh == exact at the gate SFs).
    "d6_dedup_corpus" -> Q(
      (s, dir) => Dedup.dedupNear(Lake(s, dir).documents, "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some(
        """WITH RECURSIVE tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT id_a, id_b FROM cand
          |  JOIN cnt ca ON ca.doc_id = id_a
          |  JOIN cnt cb ON cb.doc_id = id_b
          |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8),
          |edges AS (
          |  SELECT id_a AS a, id_b AS b FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |losers AS (
          |  SELECT a AS doc_id FROM reach GROUP BY a
          |  HAVING least(a, min(b)) != a)
          |SELECT doc_id, lang, source, n_chars FROM documents
          |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
          |ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- Jaccard top-k text search (lookup twin of the pair scan) ------
    // First 5 docs query the rest of the corpus; ties break on corpus_id.
    "d9_jaccard_topk" -> Q(
      (s, dir) => {
        val docs = Lake(s, dir).documents
        Dedup.jaccardTopK(
            docs.where(col("doc_id") >= 5), docs.where(col("doc_id") < 5),
            "doc_id", "text", shingleN = 3, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |-- the engine guards maxShingleDf=1000 on the CORPUS side only
          |-- (query postings stay raw): df over corpus postings, hot
          |-- shingles dropped from the corpus sets and the common join
          |), hot AS (SELECT s FROM sh WHERE doc_id >= 5
          |           GROUP BY s HAVING count(*) > 1000
          |), shc AS MATERIALIZED (SELECT doc_id, s FROM sh
          |           WHERE doc_id >= 5 AND s NOT IN (SELECT s FROM hot)
          |), cntq AS (SELECT doc_id, count(*) AS n FROM sh
          |            WHERE doc_id < 5 GROUP BY doc_id),
          |cntc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
          |com AS (
          |  SELECT q.doc_id AS query_id, c.doc_id AS corpus_id, count(*) AS common
          |  FROM sh q JOIN shc c ON q.s = c.s
          |  WHERE q.doc_id < 5
          |  GROUP BY 1, 2),
          |scored AS (
          |  SELECT query_id, corpus_id,
          |    common * 1.0 / (cq.n + cc.n - common) AS j
          |  FROM com
          |  JOIN cntq cq ON cq.doc_id = query_id
          |  JOIN cntc cc ON cc.doc_id = corpus_id)
          |SELECT query_id, rank, corpus_id, round(j, 5) AS jaccard FROM (
          |  SELECT query_id, corpus_id, j,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |         ORDER BY j DESC, corpus_id) AS INTEGER) AS rank
          |  FROM scored) r
          |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // ---- MinHash-LSH top-k search (the ANN scale path of d9) -----------
    // Portable md5 family, so the oracle rebuilds signatures and replays
    // the 16x4 banding as signature-slice equality (the d2 playbook),
    // then scores candidates with exact Jaccard and ranks top-5.
    "d10_minhash_topk" -> Q(
      (s, dir) => {
        // query docs with planted near-dups in the sf0.01 corpus (their
        // partners sit in the corpus side), so the ANN probe has true
        // neighbors to surface; random pairs in this corpus sit far
        // below the banding s-curve and produce no candidates.
        val docs = Lake(s, dir).documents
        Dedup.minHashTopK(
            docs.where(!col("doc_id").isin(8, 26, 31, 44, 45)),
            docs.where(col("doc_id").isin(8, 26, 31, 44, 45)),
            "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16,
            k = 5, family = Dedup.Md5MinHash)
          .orderBy("query_id", "rank")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          |hv AS (
          |  SELECT doc_id,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i, 1)) - 1)
          |                   * CAST(pow(16, 15 - i) AS BIGINT)
          |                   for i in generate_series(1, 15)]) AS BIGINT) AS h1,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i + 15, 1)) - 1)
          |                   * CAST(pow(16, 14 - i) AS BIGINT)
          |                   for i in generate_series(1, 14)]) AS BIGINT) AS h2
          |  FROM (SELECT doc_id, md5(s) AS m FROM sh)
          |), mh AS (
          |  SELECT doc_id, j, min((h1 + j * h2) % 1152921504606846976) AS v
          |  FROM hv, generate_series(0, 63) AS g(j)
          |  GROUP BY doc_id, j
          |), sigs AS (SELECT doc_id, list(v ORDER BY j) AS sig FROM mh GROUP BY doc_id),
          |cand AS (
          |  SELECT q.doc_id AS query_id, c.doc_id AS corpus_id
          |  FROM sigs q JOIN sigs c
          |    ON q.doc_id IN (8, 26, 31, 44, 45)
          |   AND c.doc_id NOT IN (8, 26, 31, 44, 45)
          |  WHERE list_sum([CASE WHEN q.sig[4*b+1:4*b+4] = c.sig[4*b+1:4*b+4]
          |                       THEN 1 ELSE 0 END
          |                  for b in generate_series(0, 15)]) > 0
          |), com AS (
          |  SELECT cd.query_id, cd.corpus_id, count(*) AS common
          |  FROM cand cd
          |  JOIN sh a ON a.doc_id = cd.query_id
          |  JOIN sh b ON b.doc_id = cd.corpus_id AND a.s = b.s
          |  GROUP BY 1, 2),
          |scored AS (
          |  SELECT query_id, corpus_id,
          |    common * 1.0 / (cq.n + cc.n - common) AS j
          |  FROM com
          |  JOIN cnt cq ON cq.doc_id = query_id
          |  JOIN cnt cc ON cc.doc_id = corpus_id)
          |SELECT query_id, rank, corpus_id, round(j, 5) AS jaccard FROM (
          |  SELECT query_id, corpus_id, j,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |         ORDER BY j DESC, corpus_id) AS INTEGER) AS rank
          |  FROM scored) r
          |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // ---- benchmark decontamination (n-gram overlap scrub) --------------
    // Even ids play the train split, odd ids the benchmark suite; a train
    // doc is contaminated when it shares ANY distinct word 5-gram with
    // the benchmark (the published eval-scrub rule, exact overlap — not
    // similarity). The benchmark shingle set broadcasts; output is one
    // row per train doc, zero-hit docs included.
    "d11_decontam" -> Q(
      (s, dir) => {
        val docs = Lake(s, dir).documents
        Dedup.decontaminate(
            train = docs.where(col("doc_id") % 2 === 0),
            benchmark = docs.where(col("doc_id") % 2 === 1),
            id = "doc_id", text = "text", shingleN = 5)
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
          |              || ' ' || w[i+4]
          |            for i in generate_series(1, len(w)-4)]) AS s
          |  FROM tok
          |), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 1),
          |hits AS (
          |  SELECT a.doc_id, count(*) AS c
          |  FROM sh a JOIN bench USING (s)
          |  WHERE a.doc_id % 2 = 0 GROUP BY a.doc_id)
          |SELECT d.doc_id,
          |  CAST(COALESCE(h.c, 0) AS BIGINT) AS contaminated_ngrams,
          |  COALESCE(h.c, 0) > 0 AS contaminated
          |FROM documents d LEFT JOIN hits h USING (doc_id)
          |WHERE d.doc_id % 2 = 0
          |ORDER BY d.doc_id""".stripMargin)),

    // ---- exact-substring span removal (corpus boilerplate scrub) -------
    // A word 5-gram occurring in >= 3 distinct docs is boilerplate; every
    // token any such span covers is dropped and the document re-assembled
    // from the survivors. The planted near-dup docs lose their shared
    // spans; untouched docs round-trip verbatim (n_removed = 0).
    "d12_span_removal" -> Q(
      (s, dir) => Dedup.removeBoilerplateSpans(Lake(s, dir).documents,
          "doc_id", "text", shingleN = 5, minDocFreq = 3)
        .orderBy("doc_id"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents),
          |sp AS (
          |  SELECT doc_id,
          |    unnest(generate_series(1, len(w)-4)) AS st,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
          |              || ' ' || w[i+4]
          |            for i in generate_series(1, len(w)-4)]) AS s
          |  FROM tok),
          |hot AS (
          |  SELECT s FROM (SELECT DISTINCT doc_id, s FROM sp) d
          |  GROUP BY s HAVING count(*) >= 3),
          |starts AS (
          |  SELECT sp.doc_id, list(sp.st) AS sts
          |  FROM sp JOIN hot USING (s) GROUP BY sp.doc_id)
          |SELECT t.doc_id,
          |  COALESCE(array_to_string(
          |    [t.w[i] for i in generate_series(1, len(t.w))
          |     if len(list_filter(COALESCE(st.sts, []),
          |                        x -> x <= i AND i < x + 5)) = 0],
          |    ' '), '') AS clean_text,
          |  CAST(len(t.w) -
          |    len([t.w[i] for i in generate_series(1, len(t.w))
          |         if len(list_filter(COALESCE(st.sts, []),
          |                            x -> x <= i AND i < x + 5)) = 0])
          |    AS BIGINT) AS n_removed
          |FROM tok t LEFT JOIN starts st USING (doc_id)
          |ORDER BY t.doc_id""".stripMargin)),

    // ---- chunk-level exact dedup with reassembly -----------------------
    // Fixed-window approximation of exact-substring dedup: the corpus is
    // cut into non-overlapping 16-token chunks, a chunk's first occurrence
    // in (doc_id, chunk_idx) order survives, and every later exact repeat
    // anywhere in the corpus is dropped before the doc is reassembled.
    // One chunk-keyed window shuffle + one doc-keyed rollup; the oracle
    // replays the same first-occurrence rule relationally.
    "d13_chunk_dedup" -> Q(
      (s, dir) => Dedup.dedupChunks(Lake(s, dir).documents,
          "doc_id", "text", chunkTokens = 16)
        .orderBy("doc_id"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents),
          |ch AS (
          |  SELECT doc_id, CAST((s - 1) / 16 AS INTEGER) AS ci,
          |    array_to_string(w[s:s+15], ' ') AS ct
          |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w), 16)) AS s
          |        FROM tok)),
          |fl AS (
          |  SELECT doc_id, ci, ct,
          |    ROW_NUMBER() OVER (PARTITION BY ct ORDER BY doc_id, ci) = 1 AS keep
          |  FROM ch)
          |SELECT doc_id,
          |  COALESCE(string_agg(CASE WHEN keep THEN ct END, ' ' ORDER BY ci), '')
          |    AS clean_text,
          |  CAST(count(*) AS BIGINT) AS n_chunks,
          |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- leakage-free train/eval split ---------------------------------
    // A random doc-level split leaks near-duplicates across the
    // train/eval boundary; the correct unit is the NEAR-DUP CLUSTER.
    // Clusters come from the oracled d3 edge rule + min-label connected
    // components (d5's machinery); the split is the deterministic md5
    // membership of the CLUSTER id (13/16 train), so every member of a
    // cluster lands on the same side by construction. Singletons (docs
    // in no pair) are their own cluster.
    "d14_leakage_split" -> Q(
      (s, dir) => {
        val d = Lake(s, dir).documents
        val clusters = Dedup.connectedComponents(
          Dedup.jaccardPairs(d, "doc_id", "text", shingleN = 3, threshold = 0.8),
          "id_a", "id_b")
        d.select(col("doc_id"))
          .join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          .withColumn("split",
            when(graft.operators.Sampling.hashKeep(col("cluster_id"), 13),
              "train").otherwise("eval"))
          .orderBy("doc_id")
      },
      Some(
        """WITH RECURSIVE tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |-- the engine's maxShingleDf=1000 skew guard, mirrored: shingles in
          |-- >1000 docs carry no similarity signal and are dropped from BOTH
          |-- the join and the per-doc set sizes (exact metric over the
          |-- informative-shingle universe); sh/shg MATERIALIZE (multi-
          |-- referenced — DuckDB inlining re-expands the posting unnest)
          |), hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
          |), shg AS MATERIALIZED (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT id_a, id_b FROM cand
          |  JOIN cnt ca ON ca.doc_id = id_a
          |  JOIN cnt cb ON cb.doc_id = id_b
          |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8),
          |edges AS (
          |  SELECT id_a AS a, id_b AS b FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |labels AS (
          |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          |  FROM reach GROUP BY a)
          |SELECT d.doc_id,
          |  COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
          |  CASE WHEN substr(md5(COALESCE(l.cluster_id, d.doc_id)::VARCHAR), 1, 1)
          |            < 'd'
          |       THEN 'train' ELSE 'eval' END AS split
          |FROM documents d LEFT JOIN labels l USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin)),

    // ---- incremental near-dedup: new batch vs canonical corpus ---------
    // Even ids play the already-deduped existing corpus, odd ids the
    // incoming batch: an incoming doc drops when its cluster holds ANY
    // existing doc (regardless of id order — existing is canonical) or a
    // smaller incoming id. The even/odd split makes this observably
    // different from plain min-id dedup over the union. Oracle: same
    // recursive-CTE reachability as d6 with the asymmetric survivor rule.
    "d8_dedup_incremental" -> Q(
      (s, dir) => {
        val docs = Lake(s, dir).documents
        Dedup.dedupNearIncremental(
            docs.where(col("doc_id") % 2 === 0),
            docs.where(col("doc_id") % 2 === 1),
            "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, threshold = 0.8)
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some(
        """WITH RECURSIVE tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT id_a, id_b FROM cand
          |  JOIN cnt ca ON ca.doc_id = id_a
          |  JOIN cnt cb ON cb.doc_id = id_b
          |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8),
          |edges AS (
          |  SELECT id_a AS a, id_b AS b FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          |losers AS (
          |  SELECT DISTINCT a AS doc_id FROM reach
          |  WHERE a % 2 = 1 AND a != b AND (b % 2 = 0 OR b < a))
          |SELECT doc_id, lang, source, n_chars FROM documents
          |WHERE doc_id % 2 = 1
          |  AND doc_id NOT IN (SELECT doc_id FROM losers)
          |ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- fuzzy name matching via deletion-neighborhood blocking --------
    // Entity resolution's workhorse join: supplier-name pairs within
    // Levenshtein distance 1 inside each nation, found by the SymSpell
    // deletion-variant equi-join (Σ|s| variants, hash-partitioned) + the
    // exact distance filter — never a cross join. The oracle runs the
    // naive per-nation quadratic comparison: same pair set, different
    // machinery, which is exactly what makes it a real completeness
    // check on the blocking scheme.
    "d15_fuzzy_join" -> Q(
      (s, dir) => graft.operators.FuzzyJoin.fuzzyPairs(
          Lake(s, dir).supplier.select("s_suppkey", "s_nationkey", "s_name"),
          "s_suppkey", "s_name", blockCols = Seq("s_nationkey"))
        .select(col("s_nationkey"), col("id_a"), col("id_b"), col("lev"))
        .orderBy("id_a", "id_b"),
      Some(
        """SELECT a.s_nationkey, a.s_suppkey AS id_a, b.s_suppkey AS id_b,
          |  CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS lev
          |FROM supplier a JOIN supplier b
          |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
          |WHERE levenshtein(a.s_name, b.s_name) <= 1
          |ORDER BY id_a, id_b""".stripMargin)),

    // ---- exact dedup with a keep-longest survivor policy ---------------
    // d1 keeps the min id; real curation usually keeps the LONGEST copy
    // of a duplicate group (duplicates differ by truncation). Same
    // single fp-partitioned window, caller-chosen survivor order
    // (n_chars desc, doc_id as the required unique tiebreak), groups
    // keyed on the whitespace-normalized md5 fingerprint (t4's).
    "d17_dedup_keep_longest" -> Q(
      (s, dir) => Dedup.dedupExactBy(
          Lake(s, dir).documents.withColumn("fp",
            graft.functions.TextFunctions.fingerprintMd5(col("text"))),
          Seq("fp"), Seq(desc("n_chars"), asc("doc_id")))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id, lang, source, n_chars FROM (
          |  SELECT doc_id, lang, source, n_chars,
          |    ROW_NUMBER() OVER (
          |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
          |      ORDER BY n_chars DESC, doc_id) AS rn
          |  FROM documents) t
          |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---- asymmetric shingle containment (near-superset detection) ------
    // |A∩B| / |A| over distinct 3-shingle sets: the relation Jaccard
    // misses — a snippet quoted inside a much larger page scores high
    // containment but low Jaccard, the shape contamination and
    // quote-detection care about. One symmetric common-count join
    // (id_a < id_b), both directions emitted before the per-direction
    // threshold — the join volume of d3, two output directions.
    "d16_containment_pairs" -> Q(
      (s, dir) => Dedup.containmentPairs(Lake(s, dir).documents,
          "doc_id", "text", shingleN = 3, threshold = 0.9)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents
          |), sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            for i in generate_series(1, len(w)-2)]) AS s
          |  FROM tok
          |-- the engine's maxShingleDf=1000 skew guard, mirrored: shingles in
          |-- >1000 docs carry no similarity signal and are dropped from BOTH
          |-- the join and the per-doc set sizes (exact metric over the
          |-- informative-shingle universe); sh/shg MATERIALIZE (multi-
          |-- referenced — DuckDB inlining re-expands the posting unnest)
          |), hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
          |), shg AS MATERIALIZED (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |bd AS (SELECT id_a, id_b, common FROM cand
          |       UNION ALL SELECT id_b, id_a, common FROM cand)
          |SELECT id_a, id_b, round(common * 1.0 / ca.n, 5) AS containment
          |FROM bd JOIN cnt ca ON ca.doc_id = id_a
          |WHERE common * 1.0 / ca.n >= 0.9
          |ORDER BY id_a, id_b""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.Lake
import graft.operators.Similarity

/** Similarity-search inventory over `embeddings` (SURVEY.md §2b).
  *
  * `s1` (exact brute-force top-k) is oracled in DuckDB with the identical
  * double-precision cosine; `sim` itself is excluded from the compared
  * output because the two engines may not sum floats in bit-identical
  * order — ranks with an id tie-break are stable. `s2` is the LSH scale
  * path; its recall against `s1` is asserted in the test suite.
  */
object SimilarityQueries {

  val defs: Map[String, Q] = Map(

    // ---- int8 scalar quantization (embedding storage compression) ------
    // floor-based codes are deterministic across engines (half-way
    // rounding ties are not); float->double widening is exact on both
    // sides, so the codes hash-compare byte-exact.
    // codes are dumped as a comma-joined string (the driver's comparator
    // row-sorts with pandas; LIST cells are unhashable there) — integer
    // text rendering is identical on both engines, so still cell-exact
    "s5_quantize" -> Q(
      (s, dir) => Lake(s, dir).embeddings
        .select(col("vec_id"),
          graft.functions.VectorFunctions.quantizeUint8(col("embedding")).as("q"))
        .select(col("vec_id"), col("q.lo").as("lo"), col("q.hi").as("hi"),
          array_join(col("q.codes").cast("array<string>"), ",").as("codes"))
        .orderBy("vec_id"),
      Some(
        """WITH e AS (
          |  SELECT vec_id, embedding AS v,
          |    CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS lo,
          |    CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS hi
          |  FROM embeddings)
          |SELECT vec_id, lo, hi,
          |  array_to_string([CASE WHEN hi > lo
          |        THEN CAST(floor((x::DOUBLE - lo) / (hi - lo) * 255) AS INTEGER)
          |        ELSE 0 END for x in v], ',') AS codes
          |FROM e ORDER BY vec_id""".stripMargin)),

    // ---- exact cosine top-k: 10 query vectors vs the rest --------------
    "s1_cosine_topk" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.bruteForceTopK(
            corpus = emb.where(col("vec_id") >= 10),
            queries = emb.where(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", k = 5)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
          |           FROM embeddings WHERE vec_id < 10),
          |c AS (SELECT vec_id AS neighbor_id, embedding AS cv
          |      FROM embeddings WHERE vec_id >= 10),
          |scored AS (
          |  SELECT query_id, neighbor_id,
          |    list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
          |              for i in generate_series(1, len(qv))]) /
          |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
          |                    for i in generate_series(1, len(qv))])) *
          |     sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
          |                    for i in generate_series(1, len(cv))]))) AS sim
          |  FROM q, c),
          |r AS (SELECT query_id, neighbor_id,
          |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |             ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
          |      FROM scored)
          |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
          |ORDER BY query_id, rank""".stripMargin),
      headline = true),

    // ---- LSH-bucketed approximate top-k (the 100 TB path) --------------
    // Gate: self-recall. An identical vector provably lands in its own
    // bucket (the hyperplane signs are a pure function of the vector), so
    // querying with corpus members MUST return the member itself at rank
    // 1 with sim ~1 — a falsifiable, data-independent oracle. General
    // out-of-corpus recall is hash-family-dependent (not SQL-expressible)
    // and is pinned by VectorSpec's recall-dominance tests.
    "s2_ann_lsh" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.lshTopK(
            corpus = emb.where(col("vec_id") >= 10),
            queries = emb.where(col("vec_id").between(10, 19)),
            idCol = "vec_id", vecCol = "embedding", k = 1, planes = 4)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            (col("sim") > 0.9999).as("self_sim_ok"))
          .orderBy("query_id")
      },
      Some(
        """SELECT vec_id AS query_id, CAST(1 AS INTEGER) AS rank,
          |  vec_id AS neighbor_id, true AS self_sim_ok
          |FROM embeddings WHERE vec_id BETWEEN 10 AND 19
          |ORDER BY query_id""".stripMargin)),

    // ---- hard-negative mining (contrastive training) -------------------
    // Per query, the top-3 most-similar corpus rows with a DIFFERENT
    // label — the negatives nearest the decision boundary. Same broadcast
    // shape as s1; sim itself is excluded from the compared output for
    // the same float-sum-order reason, ranks are stable with the id
    // tie-break.
    "s8_hard_negatives" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.hardNegatives(
            corpus = emb.where(col("vec_id") >= 10),
            queries = emb.where(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 3)
          .select("query_id", "rank", "neighbor_id", "n_label")
          .orderBy("query_id", "rank")
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
          |           FROM embeddings WHERE vec_id < 10),
          |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nl
          |      FROM embeddings WHERE vec_id >= 10),
          |scored AS (
          |  SELECT query_id, neighbor_id, nl,
          |    list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
          |              for i in generate_series(1, len(qv))]) /
          |    (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
          |                    for i in generate_series(1, len(qv))])) *
          |     sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
          |                    for i in generate_series(1, len(cv))]))) AS sim
          |  FROM q, c WHERE nl <> ql),
          |r AS (SELECT query_id, neighbor_id, nl,
          |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |             ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
          |      FROM scored)
          |SELECT query_id, rank, neighbor_id, nl AS n_label
          |FROM r WHERE rank <= 3
          |ORDER BY query_id, rank""".stripMargin)),

    // ---- deterministic random-negative sampling ------------------------
    // The uniform half of a contrastive pair generator: 4 draws per
    // anchor via the portable 60-bit md5 hash of (seed, anchor, j); the
    // +1...mod-N construction provably never draws the anchor itself,
    // and the oracle rebuilds the hash digit-for-digit (same playbook as
    // c8). Anchor-label collisions are flagged, not dropped.
    "s9_random_negatives" -> Q(
      (s, dir) => Similarity.randomNegatives(Lake(s, dir).embeddings,
          "vec_id", "label", k = 4, seed = 11L)
        .orderBy("anchor_id", "j"),
      Some(
        """WITH n AS (SELECT max(vec_id) + 1 AS nn FROM embeddings),
          |a AS (SELECT vec_id AS anchor_id, label AS anchor_label,
          |        unnest(generate_series(0, 3)) AS j
          |      FROM embeddings),
          |h AS (
          |  SELECT anchor_id, anchor_label, j,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i, 1)) - 1)
          |                   * CAST(pow(16, 15 - i) AS BIGINT)
          |                   for i in generate_series(1, 15)]) AS BIGINT) AS hv
          |  FROM (SELECT anchor_id, anchor_label, j,
          |          md5('11:' || anchor_id::VARCHAR || ':' || j::VARCHAR) AS m
          |        FROM a) t),
          |x AS (
          |  SELECT anchor_id, anchor_label, CAST(j AS INTEGER) AS j,
          |    (anchor_id + 1 + hv % (nn - 1)) % nn AS neg_id
          |  FROM h, n)
          |SELECT x.anchor_id, x.j, CAST(x.neg_id AS BIGINT) AS neg_id,
          |  e.label AS neg_label,
          |  e.label = x.anchor_label AS label_collision
          |FROM x JOIN embeddings e ON e.vec_id = x.neg_id
          |ORDER BY x.anchor_id, x.j""".stripMargin)),

    // ---- IVF-probed approximate top-k -----------------------------------
    // Gate: recall floor vs the exact top-k (s1), computed in-plan — the
    // IVF candidate set is probe-order-dependent (not SQL-expressible),
    // but its recall against exact is deterministic on fixed data; probes
    // grow monotonically, so nProbe=4 recall >= the measured nProbe=2
    // recall (0.34 on this near-random corpus) and the 0.25 floor holds
    // with margin. A false emission = hash mismatch = gate failure.
    "s4_ann_ivf" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        val corpus = emb.where(col("vec_id") >= 10)
        val queries = emb.where(col("vec_id") < 10)
        val exact = Similarity.bruteForceTopK(corpus, queries,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val ivf = Similarity.ivfTopK(corpus, queries,
            "vec_id", "embedding", k = 5, planes = 4, nProbe = 4)
          .select(col("query_id").as("q"), col("neighbor_id").as("n"))
        val hits = exact.join(ivf,
            exact("query_id") === ivf("q") && exact("neighbor_id") === ivf("n"))
          .agg(count(lit(1)).as("hits"))
        val counts = ivf.agg(count(lit(1)).as("ivf_rows"),
          countDistinct(col("q")).as("n_queries"))
        counts.crossJoin(hits)
          .select(col("n_queries"), col("ivf_rows"),
            (col("hits").cast("double") / (col("n_queries") * 5) >= 0.25)
              .as("recall_ok"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_queries,
          |  CAST(count(*) * 5 AS BIGINT) AS ivf_rows,
          |  true AS recall_ok
          |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // ---- deterministic random projection (JL dimension reduction) ------
    // 64 -> 8 dims with the md5-derived ±1 matrix; both engines rebuild
    // the identical coefficients and fold float->double left-to-right,
    // so the projected doubles hash-compare bit-exact.
    // compared one row per (vec_id, output dim): the projected doubles
    // stay a scalar DOUBLE column (bit-exact compare preserved), and no
    // LIST cell hits the driver's pandas row sort
    "s7_random_projection" -> Q(
      (s, dir) => Lake(s, dir).embeddings
        .select(col("vec_id"),
          posexplode(
            graft.functions.VectorFunctions.randomProjectMd5(col("embedding"), 8))
            .as(Seq("j", "val")))
        .orderBy("vec_id", "j"),
      Some(
        """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings)
          |SELECT vec_id, CAST(j AS INTEGER) AS j,
          |  list_sum([v[i]::DOUBLE *
          |    (CASE WHEN substr(md5(j::VARCHAR || ':' || (i-1)::VARCHAR), 1, 1) >= '8'
          |          THEN 1.0 ELSE -1.0 END)
          |    for i in generate_series(1, len(v))]) AS val
          |FROM e, generate_series(0, 7) AS g(j)
          |ORDER BY vec_id, j""".stripMargin)),

    // ---- SemDedup: cluster-local semantic dedup ------------------------
    // Deterministic sign-pattern clusters (axis hyperplanes — the
    // SQL-portable face of the operator; production swaps in trained IVF
    // cells), then drop-any-smaller-id-neighbor within each cluster.
    // Same portable cosine + 0.45 threshold the s3 oracle already pins.
    "s6_semdedup" -> Q(
      (s, dir) => graft.operators.Similarity.semDedup(Lake(s, dir).embeddings,
          "vec_id", "embedding", threshold = 0.45, signDims = 2)
        .orderBy("vec_id"),
      Some(
        """WITH e AS (
          |  SELECT vec_id, embedding AS v,
          |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
          |    + 2 * (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END) AS cluster
          |  FROM embeddings),
          |losers AS (
          |  SELECT DISTINCT b.vec_id FROM e a JOIN e b
          |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          |  WHERE
          |    list_sum([a.v[i]::DOUBLE * b.v[i]::DOUBLE
          |              for i in generate_series(1, len(a.v))]) /
          |    (sqrt(list_sum([a.v[i]::DOUBLE * a.v[i]::DOUBLE
          |                    for i in generate_series(1, len(a.v))])) *
          |     sqrt(list_sum([b.v[i]::DOUBLE * b.v[i]::DOUBLE
          |                    for i in generate_series(1, len(b.v))]))) >= 0.45)
          |SELECT e.vec_id, CAST(e.cluster AS INTEGER) AS cluster,
          |  l.vec_id IS NULL AS kept
          |FROM e LEFT JOIN losers l ON l.vec_id = e.vec_id
          |ORDER BY e.vec_id""".stripMargin)),

    // ---- embedding near-duplicate pairs --------------------------------
    // planes = 0 => exact all-pairs (SQL-oracle-able); the driver corpus
    // has no planted embedding near-dups (max pairwise cosine ~0.51), so
    // the threshold sits where real pairs exist. The LSH-bucketed scale
    // path is the same operator with planes > 0 (recall covered in tests).
    "s3_embedding_neardup" -> Q(
      (s, dir) => Similarity.cosineNearDupPairs(Lake(s, dir).embeddings,
          "vec_id", "embedding", threshold = 0.45, planes = 0)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b"),
      Some(
        """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
          |p AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |    list_sum([a.v[i]::DOUBLE * b.v[i]::DOUBLE
          |              for i in generate_series(1, len(a.v))]) /
          |    (sqrt(list_sum([a.v[i]::DOUBLE * a.v[i]::DOUBLE
          |                    for i in generate_series(1, len(a.v))])) *
          |     sqrt(list_sum([b.v[i]::DOUBLE * b.v[i]::DOUBLE
          |                    for i in generate_series(1, len(b.v))]))) AS sim
          |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
          |SELECT id_a, id_b FROM p WHERE sim >= 0.45
          |ORDER BY id_a, id_b""".stripMargin)),

    // ---- product quantization (vector compression) ---------------------
    // 64 float dims → four 4-bit codes (128× at rest): per-subspace
    // k-means codebooks (deterministic hash-seeded init, 2 Lloyd
    // rounds), decode = centroid concatenation. Codebook training is not
    // SQL-expressible, so the gate is s4's style: in-plan assertions the
    // data must EARN — mean reconstruction cosine ≥ 0.4 (measured
    // 0.47–0.51 across SFs; a broken codebook or mis-stitched decode
    // lands far below), a per-vector floor, and the code-range contract.
    // The m-vs-quality ordering (m=4 beats m=1 VQ) is spec-pinned.
    "s11_pq_quantize" -> Q(
      (s, dir) => {
        val pq = Similarity.pqReconstruction(Lake(s, dir).embeddings,
          "vec_id", "embedding", m = 4, planes = 4, kmeansIters = 2)
        pq.agg(count(lit(1)).as("n_vectors"),
          (avg("recon_cos") >= 0.4).as("recon_ok"),
          (min("recon_cos") >= 0.1).as("floor_ok"),
          (min(array_min(col("codes"))) >= 0 &&
            max(array_max(col("codes"))) <= 15).as("codes_ok"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
          |  true AS recon_ok, true AS floor_ok, true AS codes_ok
          |FROM embeddings""".stripMargin)),

    // ---- truncated-dimension retrieval agreement (MRL question) --------
    // Can the index serve 16 of 64 dims (4× cheaper scan/storage) and
    // keep the same answers? Per query: the exact top-1 neighbor under
    // FULL cosine vs under FIRST-16-DIMS cosine, plus the corpus-level
    // agreement count. Both rankings are exact window argmaxes with id
    // tie-breaks (s1's machinery); `slice` is engine-portable, so the
    // whole evaluation is SQL-expressible — no gate-style oracle needed.
    "s12_truncation_eval" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        val corpus = emb.where(col("vec_id") >= 10)
        val queries = emb.where(col("vec_id") < 10)
        def top1(vec: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
          val q = queries.select(col("vec_id").as("query_id"),
            vec(col("embedding")).as("qv"))
          val c = corpus.select(col("vec_id").as("neighbor_id"),
            vec(col("embedding")).as("cv"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")
            .orderBy(desc("sim"), asc("neighbor_id"))
          c.crossJoin(broadcast(q))
            .withColumn("sim", graft.functions.VectorFunctions.cosine(col("qv"), col("cv")))
            .withColumn("rn", row_number().over(w))
            .where(col("rn") === 1)
            .select(col("query_id"), col("neighbor_id"))
        }
        val full = top1(identity).withColumnRenamed("neighbor_id", "full_top1")
        val trunc = top1(v => slice(v, 1, 16)).withColumnRenamed("neighbor_id", "trunc_top1")
        full.join(trunc, "query_id")
          .select(col("query_id"), col("full_top1"), col("trunc_top1"),
            (col("full_top1") === col("trunc_top1")).as("agree"))
          .orderBy("query_id")
      },
      Some {
        val cos = (a: String, b: String) =>
          s"""list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
             |              for i in generate_series(1, len($a))]) /
             |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
             |                    for i in generate_series(1, len($a))])) *
             |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
             |                    for i in generate_series(1, len($b))])))""".stripMargin
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           |           FROM embeddings WHERE vec_id < 10),
           |c AS (SELECT vec_id AS neighbor_id, embedding AS cv
           |      FROM embeddings WHERE vec_id >= 10),
           |fscore AS (
           |  SELECT query_id, neighbor_id, ${cos("qv", "cv")} AS sim
           |  FROM q, c),
           |f1 AS (SELECT query_id, neighbor_id AS full_top1 FROM (
           |    SELECT query_id, neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY query_id
           |        ORDER BY sim DESC, neighbor_id) AS rn
           |    FROM fscore) WHERE rn = 1),
           |tq AS (SELECT query_id, qv[1:16] AS qv FROM q),
           |tc AS (SELECT neighbor_id, cv[1:16] AS cv FROM c),
           |tscore AS (
           |  SELECT query_id, neighbor_id, ${cos("qv", "cv")} AS sim
           |  FROM tq, tc),
           |t1 AS (SELECT query_id, neighbor_id AS trunc_top1 FROM (
           |    SELECT query_id, neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY query_id
           |        ORDER BY sim DESC, neighbor_id) AS rn
           |    FROM tscore) WHERE rn = 1)
           |SELECT f1.query_id, f1.full_top1, t1.trunc_top1,
           |  f1.full_top1 = t1.trunc_top1 AS agree
           |FROM f1 JOIN t1 USING (query_id)
           |ORDER BY f1.query_id""".stripMargin
      }),

    // ---- MMR diversity re-ranking --------------------------------------
    // The rerank between ANN retrieval and a RAG / training-batch
    // consumer: greedy argmax of 0.7·sim(q,d) − 0.3·max-sim-to-selected
    // over the top-20 candidate pool, 5 picks, ties to the smaller id.
    // The distributed stage is the corpus top-k scan; the greedy runs
    // over a parameter-bounded (20 + 20²-row per query) working set. The
    // oracle unrolls the same k greedy rounds as chained CTEs over the
    // identical double-precision cosine (s1's formula), scores rounded
    // at 4 decimals (ulp-vs-step argument, t21).
    "s10_mmr_rerank" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.mmrRerank(
            corpus = emb.where(col("vec_id") >= 10),
            query = emb.where(col("vec_id") === 0),
            idCol = "vec_id", vecCol = "embedding",
            k = 5, fetch = 20, lambda = 0.7)
          .orderBy("rank")
      },
      Some(mmrOracleSql(lambdaNum = "0.7", penaltyNum = "0.3",
        fetch = 20, k = 5))),

    // ---- MMR fed by the pluggable ANN candidate stage ------------------
    // Exact-replay gate (the s2/s4 playbook): with 0 hyperplanes every
    // vector lands in the single LSH bucket, so lshTopK's candidate set
    // PROVABLY equals the exact top-`fetch` — the DuckDB oracle can then
    // replay the greedy over the exact pool while the Spark side runs the
    // REAL ANN plumbing (bucket column, bucket equi-join, probe
    // explosion). Recall behavior with real planes is hash-family-
    // dependent (not SQL-expressible) and is pinned by VectorSpec's
    // lambda=1 equivalence and recall tests. Different k/fetch/lambda
    // than s10 so the two gates cannot mask each other.
    "s13_mmr_ann" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.mmrRerank(
            corpus = emb.where(col("vec_id") >= 10),
            query = emb.where(col("vec_id") === 0),
            idCol = "vec_id", vecCol = "embedding",
            k = 4, fetch = 15, lambda = 0.5,
            candidates = Similarity.lshTopK(_, _, _, _, _, planes = 0))
          .orderBy("rank")
      },
      Some(mmrOracleSql(lambdaNum = "0.5", penaltyNum = "0.5",
        fetch = 15, k = 4))),

    // ---- persisted IVF index: build once, query from disk --------------
    // Two claims, each pinned by a boolean the hash gate makes load-
    // bearing: (a) serving from the persisted bucket-partitioned index
    // returns EXACTLY the rows of an inline assign-and-query path over
    // the raw corpus at the same parameters (kmeansIters=0 assignment is
    // deterministic, and parquet roundtrips the float vectors
    // bit-exactly — the two plans must agree row for row; the inline leg
    // shares the index's centroid table, sound because the training is
    // deterministic and the roundtrip is spec-pinned in VectorIndexSpec);
    // (b) the s4 recall floor holds for the served answer too. DuckDB
    // independently pins the query count; the probed scan's partition
    // pruning is plan-pinned in VectorIndexSpec.
    "s14_ivf_index" -> Q(
      (s, dir) => {
        import graft.operators.VectorIndex
        val emb = Lake(s, dir).embeddings
        val corpus = emb.where(col("vec_id") >= 10)
        val queries = emb.where(col("vec_id") < 10)
        // cwd-relative (matches Bench and the specs): the query suite
        // must not pin one checkout location. Wiped per run: the gate
        // rebuilds from scratch anyway, and a fresh dir keeps the
        // timed work identical run to run (no generation accretion)
        val stage = s"target/ivf_stage/idx_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
        VectorIndex.build(corpus, stage, "vec_id", "embedding", planes = 4)
        val served = VectorIndex.query(s, stage, queries,
          "vec_id", "embedding", k = 5, nProbe = 4)
        // Inline leg: cell assignment re-derived from the RAW corpus
        // in-plan, probe ranking against the index's just-written
        // centroid table (optimization r20, guide §1.2/§5): kmeansIters=0
        // training is deterministic and parquet roundtrips the doubles
        // bit-exactly (spec-pinned in VectorIndexSpec), so the stored
        // table IS the freshly trained one — recomputing it inline was a
        // duplicate width-wise mean aggregation plus a dim-probe action
        // per run. The agreement check still pins the stored CELL data
        // and the whole probe/rank path against an independent in-plan
        // derivation; the brute-force recall floor below is centroid-free.
        val inline = Similarity.ivfTopKPreTrained(corpus,
          VectorIndex.centroids(s, stage), queries,
          "vec_id", "embedding", k = 5, planes = 4, nProbe = 4)
        val sKeys = served.select("query_id", "rank", "neighbor_id")
        val iKeys = inline.select("query_id", "rank", "neighbor_id")
        val exact = Similarity.bruteForceTopK(corpus, queries,
            "vec_id", "embedding", k = 5)
          .select(col("query_id").as("eq"), col("neighbor_id").as("en"))
        // (query_id, rank) is unique per side (row_number), so multiset
        // equality is exactly "the full-outer join has no one-sided
        // rows". One pass over the served keys (optimization r20, guide
        // §1.2): the former three-branch DAG (mismatch agg + hits agg +
        // n_queries agg, cross-joined) executed the served leg three
        // times; full-outer-joining the inline keys, left-joining the
        // broadcast brute-force pairs onto the served rows, and folding
        // all three counters into ONE aggregate computes the identical
        // booleans with one served scan and no combine joins.
        val joined = sKeys.withColumn("__s", lit(1))
          .join(iKeys.withColumn("__i", lit(1)),
            Seq("query_id", "rank", "neighbor_id"), "full_outer")
          .join(broadcast(exact),
            col("query_id") === col("eq") && col("neighbor_id") === col("en")
              && col("__s").isNotNull, "left")
        joined.agg(
            countDistinct(when(col("__s").isNotNull, col("query_id")))
              .as("n_queries"),
            count(when(col("__s").isNull || col("__i").isNull, lit(1)))
              .as("n_mismatch"),
            count(col("en")).as("hits"))
          .select(col("n_queries"),
            (col("n_mismatch") === 0).as("index_matches_inline"),
            (col("hits").cast("double") / (col("n_queries") * 5) >= 0.25)
              .as("recall_ok"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_queries,
          |  true AS index_matches_inline, true AS recall_ok
          |FROM embeddings WHERE vec_id < 10""".stripMargin),
      headline = true),

    // ---- semantic decontamination (embedding-space benchmark leakage) --
    // The embedding complement of d11's n-gram decontamination: corpus
    // rows (vec_id >= 10) are flagged when ANY benchmark vector
    // (vec_id < 10) sits at cosine >= 0.4. planes=0 is the exact
    // single-bucket mode (the s3 playbook) so the DuckDB brute-force
    // predicate replays it verbatim; real-planes recall behavior is
    // spec-pinned in VectorSpec (ANN can only lower recall — the exact
    // cosine filter makes false positives impossible).
    "s15_semantic_decontam" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.semanticDecontaminate(
            corpus = emb.where(col("vec_id") >= 10).select("vec_id", "embedding"),
            benchmark = emb.where(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding",
            threshold = 0.4, planes = 0)
          .select(col("vec_id"), col("contaminated"))
          .orderBy("vec_id")
      },
      Some(
        """WITH c AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id >= 10),
          |b AS (SELECT embedding AS w FROM embeddings WHERE vec_id < 10),
          |hits AS (
          |  SELECT DISTINCT c.vec_id FROM c JOIN b ON
          |    list_sum([c.v[i]::DOUBLE * b.w[i]::DOUBLE
          |              for i in generate_series(1, len(c.v))]) /
          |    (sqrt(list_sum([c.v[i]::DOUBLE * c.v[i]::DOUBLE
          |                    for i in generate_series(1, len(c.v))])) *
          |     sqrt(list_sum([b.w[i]::DOUBLE * b.w[i]::DOUBLE
          |                    for i in generate_series(1, len(b.w))]))) >= 0.4)
          |SELECT c.vec_id, (h.vec_id IS NOT NULL) AS contaminated
          |FROM c LEFT JOIN hits h ON c.vec_id = h.vec_id
          |ORDER BY c.vec_id""".stripMargin)),

    // ---- hybrid retrieval: BM25 × embedding cosine via RRF -------------
    // The standard hybrid-search combiner: a lexical BM25 top-20 (t27's
    // scorer, same terms and constants) and an embedding-cosine top-20
    // (query = vector 0) fused by reciprocal-rank fusion, rrf(d) =
    // Σ 1/(60 + rank). Ranks are cross-engine stable BY CONSTRUCTION:
    // the BM25 leg ranks on the 4-decimal ROUNDED score with the id
    // tie-break (t27's argument), the cosine leg on raw sim with the id
    // tie-break (s1's precedent); the fused sum has ≤2 terms, so IEEE
    // addition order cannot shift it, and the output rounds anyway.
    // BM25 ranks come from the k-bounded TopKAggregator + posexplode —
    // no global window (the t25 pattern); fusion itself is one union +
    // one hash aggregate over 40 candidate rows, corpus-independent.
    "s16_hybrid_rrf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        import graft.functions.TextFunctions.tokens
        // BM25 leg — t27's scorer verbatim (k1=1.2, b=0.75)
        val qTerms = Seq("data", "scan", "hash")
        val d = Lake(s, dir).documents
        val lens = d.select(col("doc_id"),
          size(tokens(col("text"))).cast(DoubleType).as("dl"))
        val stats = lens.agg(avg(col("dl")).as("avgdl"),
          count(lit(1)).cast(DoubleType).as("n"))
        val tf = d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
          .where(col("term").isin(qTerms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).cast(DoubleType).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).cast(DoubleType).as("df"))
        val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
        val norm = col("tf") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))
        val bmScored = tf.join(dfreq, "term").join(lens, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("s", idf * col("tf") * lit(2.2) / norm)
          .groupBy("doc_id").agg(round(sum(col("s")), 4).as("bm25"))
        val topk = graft.functions.TopKAggregator.topK(20)
        val bmRank = bmScored
          .agg(topk(col("bm25"), col("doc_id")).as("top"))
          .select(posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("t.id").as("doc_id"),
            (col("pos") + 1).cast("int").as("rank"))
        // embedding leg — exact cosine top-20 for query vector 0
        val emb = Lake(s, dir).embeddings
        val cosRank = Similarity.bruteForceTopK(
            corpus = emb, queries = emb.where(col("vec_id") === 0),
            idCol = "vec_id", vecCol = "embedding", k = 20)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        Similarity.rrfFuse(Seq(bmRank, cosRank), "doc_id", "rank", kRrf = 60)
          .select(col("doc_id"), (round(col("rrf"), 6) + 0.0).as("rrf"),
            col("n_lists"))
          .orderBy(desc("rrf"), asc("doc_id")).limit(10)
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents),
          |lens AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM tok),
          |st AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM lens),
          |tf AS (
          |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
          |  FROM (SELECT doc_id, unnest(w) AS term FROM tok) t
          |  WHERE term IN ('data', 'scan', 'hash')
          |  GROUP BY doc_id, term),
          |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
          |sc AS (
          |  SELECT tf.doc_id,
          |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf.tf * 2.2
          |              / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / avgdl))), 4) AS bm25
          |  FROM tf JOIN dfq USING (term) JOIN lens l USING (doc_id), st
          |  GROUP BY tf.doc_id),
          |bmr AS (
          |  SELECT doc_id, CAST(ROW_NUMBER() OVER
          |    (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r FROM sc),
          |qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
          |cs AS (
          |  SELECT c.vec_id AS doc_id,
          |    list_sum([qv.v[i]::DOUBLE * c.embedding[i]::DOUBLE
          |              for i in generate_series(1, len(qv.v))]) /
          |    (sqrt(list_sum([qv.v[i]::DOUBLE * qv.v[i]::DOUBLE
          |                    for i in generate_series(1, len(qv.v))])) *
          |     sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
          |                    for i in generate_series(1, len(c.embedding))])))
          |      AS sim
          |  FROM embeddings c, qv),
          |csr AS (
          |  SELECT doc_id, CAST(ROW_NUMBER() OVER
          |    (ORDER BY sim DESC, doc_id) AS INTEGER) AS r FROM cs),
          |u AS (
          |  SELECT doc_id, r FROM bmr WHERE r <= 20
          |  UNION ALL SELECT doc_id, r FROM csr WHERE r <= 20)
          |SELECT doc_id, round(sum(1.0 / (60 + r)), 6) + 0.0 AS rrf,
          |  CAST(count(*) AS BIGINT) AS n_lists
          |FROM u GROUP BY doc_id
          |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- deterministic k-means over embeddings -------------------------
    // Lloyd with the engine's replayable-iteration contract (the BPE
    // playbook): seed = the k smallest vec_ids' vectors, 3 rounds of
    // assign/re-mean with every published centroid coordinate rounded to
    // 6 decimals and every distance to 9 — so the DuckDB chain replays
    // the whole fit and the final assignment hash-compares exactly.
    // Cluster structure itself is spec-pinned on an anisotropic fixture
    // (ClusteringSpec); here the synthetic near-isotropic embeddings
    // just exercise the full pipeline end to end.
    "s17_kmeans" -> Q(
      (s, dir) => {
        import graft.operators.Clustering
        Clustering.kmeansAssign(Lake(s, dir).embeddings,
            "vec_id", "embedding", k = 8, iters = 3)
          .orderBy("vec_id")
      },
      Some(kmeansOracleSql(k = 8, iters = 3, dim = 64)),
      headline = true),

    // ---- PCA-1 by matrix-free power iteration --------------------------
    // Top principal direction of the mean-centered embeddings via 8
    // power-iteration rounds — each round is one per-row dot product
    // plus one dim-cell aggregate (X'(Xv), never the dim x dim Gram).
    // Published state (mean, per-round w, direction, scores) is rounded
    // (6/5/6/6 decimals), so the oracle replays every round bit-for-bit.
    // `iters` is a fixed deterministic-replay contract, not a
    // convergence test: convergence on spectrally-peaked data is
    // spec-pinned in ClusteringSpec (these near-isotropic synthetics
    // have lambda2/lambda1 ~ 0.99, where NO iteration count separates
    // components — the honest behavior is "the result of 8 rounds").
    "s18_pca_power" -> Q(
      (s, dir) => {
        import graft.operators.Clustering
        Clustering.pcaProject(Lake(s, dir).embeddings,
            "vec_id", "embedding", iters = 8)
          .orderBy("vec_id")
      },
      Some(pcaOracleSql(iters = 8, dim = 64)),
      headline = true),

    // ---- serving-path latency for the persisted IVF index --------------
    // s14 gates the FULL lifecycle (fresh build + served-vs-inline
    // agreement + recall floor) and therefore times a build per bench
    // rep; this is the complementary steady-state signal — build once
    // if absent, then serve — so the headline bench tracks probe
    // latency (the dynamic-partition-pruned bucket join) separately
    // from build cost. Row-shape correctness of the served answer is
    // already pinned by s14 + VectorIndexSpec; the oracle here pins the
    // serving CONTRACT: k rows for every query (the probed buckets
    // always hold >= k candidates at these parameters — 500+ corpus
    // rows over 16 cells, 4 probed).
    "s19_ivf_serve" -> Q(
      (s, dir) => {
        import graft.operators.VectorIndex
        val emb = Lake(s, dir).embeddings
        val corpus = emb.where(col("vec_id") >= 10)
        val queries = emb.where(col("vec_id") < 10)
        val stage = s"target/ivf_stage/serve_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        if (VectorIndex.generations(s, stage).isEmpty)
          VectorIndex.build(corpus, stage, "vec_id", "embedding", planes = 4)
        VectorIndex.query(s, stage, queries,
            "vec_id", "embedding", k = 5, nProbe = 4)
          .agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("n_rows"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_queries,
          |  CAST(count(*) * 5 AS BIGINT) AS n_rows
          |FROM embeddings WHERE vec_id < 10""".stripMargin),
      headline = true),

    // ---- embedding-space outlier scoring (k-means distance) ------------
    // The curation signal cluster distance gives for free: a vector far
    // from its OWN (nearest) centroid is far from every centroid — the
    // corrupt/off-distribution rows a pipeline reviews before training.
    // Top-20 by the same rounded squared-L2 the assignment ranks, so
    // cluster and dist are consistent by construction; the full fit +
    // ranking replays in the oracle. TakeOrderedAndProject, no global
    // sort.
    "s20_centroid_outliers" -> Q(
      (s, dir) => {
        import graft.operators.Clustering
        Clustering.centroidDistances(Lake(s, dir).embeddings,
            "vec_id", "embedding", k = 8, iters = 3)
          .orderBy(desc("dist"), asc("vec_id")).limit(20)
      },
      Some(kmeansCtes(k = 8, iters = 3, dim = 64) +
        """
          |SELECT vec_id, cluster, d AS dist FROM a3
          |ORDER BY d DESC, vec_id LIMIT 20""".stripMargin)),

    // ---- multi-component PCA by deflation ------------------------------
    // Component 2 is fit on the residual left after subtracting the
    // pc1 projection — the standard deflation — with every published
    // quantity rounded exactly as s18, so the oracle chains two blocks
    // of the power-iteration CTE rounds over successive residual
    // lists. pc1 here coincides with s18's (same mean, same first-
    // component fit, same fold), which cross-pins the two gates.
    "s22_pca_deflate" -> Q(
      (s, dir) => {
        import graft.operators.Clustering
        Clustering.pcaProjectK(Lake(s, dir).embeddings,
            "vec_id", "embedding", k = 2, iters = 8)
          .orderBy("vec_id")
      },
      Some(pcaKOracleSql(k = 2, iters = 8, dim = 64))),

    // ---- PCA reconstruction-error outlier scoring ----------------------
    // The residual squared norm after removing the 2 fitted components:
    // the structural-anomaly complement of s20's centroid distance (a
    // row can sit near its centroid yet be unlike the corpus's low-rank
    // structure). Same deterministic fit as s22; the oracle extends the
    // deflation chain one residual further and sums its squares.
    "s23_pca_error" -> Q(
      (s, dir) => {
        import graft.operators.Clustering
        Clustering.pcaReconstructionError(Lake(s, dir).embeddings,
            "vec_id", "embedding", k = 2, iters = 8)
          .orderBy("vec_id")
      },
      Some(pcaErrorOracleSql(k = 2, iters = 8, dim = 64))),

    // ---- per-dimension z-score standardization -------------------------
    // The whitening diagnostic before distance-based processing: each
    // coordinate scaled by the corpus's per-dim mean and population
    // stddev (moments rounded, sd composed from the rounded pieces so
    // both engines scale with identical constants), summarized per row
    // as (z_min, z_max, z_norm). A |z| far outside its peers flags a
    // broken dimension or a corrupt row.
    "s24_standardize" -> Q(
      (s, dir) => {
        import graft.operators.Clustering
        Clustering.standardize(Lake(s, dir).embeddings,
            "vec_id", "embedding")
          .orderBy("vec_id")
      },
      Some(
        """WITH v AS (SELECT vec_id, embedding AS x FROM embeddings),
          |dims AS (SELECT i FROM generate_series(1, 64) t(i)),
          |mo AS (SELECT t.i, round(avg(v.x[t.i]::DOUBLE), 6) AS m,
          |         round(avg(v.x[t.i]::DOUBLE * v.x[t.i]::DOUBLE), 6) AS q
          |       FROM v CROSS JOIN dims t GROUP BY t.i),
          |sdl AS (SELECT i, m,
          |         round(sqrt(CASE WHEN q - m * m > 0
          |                    THEN q - m * m ELSE 0 END), 6) AS sd
          |        FROM mo),
          |ml AS (SELECT list(m ORDER BY i) AS mv,
          |              list(sd ORDER BY i) AS sv FROM sdl),
          |z AS (SELECT vec_id,
          |        [CASE WHEN sv[i] = 0 THEN 0.0
          |              ELSE (x[i]::DOUBLE - mv[i]) / sv[i] END
          |         for i in generate_series(1, len(x))] AS z
          |      FROM v, ml)
          |SELECT vec_id,
          |  round(list_aggregate(z, 'min'), 6) AS z_min,
          |  round(list_aggregate(z, 'max'), 6) AS z_max,
          |  round(sqrt(list_sum([e * e for e in z])), 6) AS z_norm
          |FROM z ORDER BY vec_id""".stripMargin)),

    // ---- cluster-balanced deterministic sample -------------------------
    // Diversity subsampling: exactly 10 vectors per learned k-means
    // cluster, drawn as the smallest portable md5 hashes (t25's
    // exact-k machinery — map-side k-bounded TopKAggregator, no
    // per-cluster window sort), so dense regions can't crowd out the
    // corpus tails in a training subsample. The oracle replays the fit
    // AND the draw.
    "s21_cluster_sample" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        import graft.operators.Clustering
        val h52 = conv(substring(md5(concat(lit("21:"),
          col("vec_id").cast("string"))), 1, 13), 16, 10).cast(LongType)
        val topk = graft.functions.TopKAggregator.topK(10)
        Clustering.kmeansAssign(Lake(s, dir).embeddings,
            "vec_id", "embedding", k = 8, iters = 3)
          .select(col("cluster"), (-h52).cast(DoubleType).as("nh"), col("vec_id"))
          .groupBy("cluster").agg(topk(col("nh"), col("vec_id")).as("top"))
          .select(col("cluster"), posexplode(col("top")).as(Seq("pos", "s")))
          .select(col("cluster"), (col("pos") + 1).cast("int").as("smp_rank"),
            col("s.id").as("vec_id"))
          .orderBy("cluster", "smp_rank")
      },
      Some(kmeansCtes(k = 8, iters = 3, dim = 64) +
        """,
          |h AS (
          |  SELECT a3.vec_id, a3.cluster,
          |    CAST(list_sum([(strpos('0123456789abcdef',
          |                    substr(md5('21:' || a3.vec_id::VARCHAR), i, 1)) - 1)
          |                   * CAST(pow(16, 13 - i) AS BIGINT)
          |                   for i in generate_series(1, 13)]) AS BIGINT) AS hv
          |  FROM a3),
          |r AS (
          |  SELECT vec_id, cluster,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY cluster
          |         ORDER BY hv, vec_id) AS INTEGER) AS smp_rank
          |  FROM h)
          |SELECT cluster, smp_rank, vec_id FROM r WHERE smp_rank <= 10
          |ORDER BY cluster, smp_rank""".stripMargin))
  )

  /** DuckDB replay of the [[graft.operators.Clustering]] k-means fit:
    * one (distances, assignment, means, next-centroids) CTE block per
    * Lloyd round, ending at the FINAL distance/assignment pair
    * `a<iters>` (vec_id, cluster, d) for the consumer's SELECT. The
    * re-referenced centroid CTEs are MATERIALIZED (the BPE-oracle
    * convention — default inlining re-expands each round's state into
    * its readers). Distances round to 9 decimals before the argmin and
    * centroid coordinates to 6 before publication, mirroring the Spark
    * side, so the two engines walk identical state between roundings. */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH v AS (SELECT vec_id, embedding AS x FROM embeddings),
         |dims AS (SELECT i FROM generate_series(1, $dim) t(i)),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         |              [round(e::DOUBLE, 6) for e in embedding] AS c
         |       FROM (SELECT vec_id, embedding FROM embeddings
         |             ORDER BY vec_id LIMIT $k))""".stripMargin
    def distAssign(r: Int): String =
      s""",
         |d$r AS (SELECT v.vec_id, c.cid,
         |         round(list_sum([(v.x[i]::DOUBLE - c.c[i]) *
         |               (v.x[i]::DOUBLE - c.c[i])
         |               for i in generate_series(1, len(v.x))]), 9) AS d
         |       FROM v CROSS JOIN c$r c),
         |a$r AS (SELECT vec_id, cid AS cluster, d FROM
         |        (SELECT vec_id, cid, d, row_number() OVER
         |           (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d$r)
         |       WHERE rn = 1)""".stripMargin
    for (r <- 0 until iters) {
      sb ++= distAssign(r)
      sb ++=
        s""",
           |m$r AS (SELECT a.cluster AS cid, t.i,
           |         round(avg(v.x[t.i]::DOUBLE), 6) AS m
           |       FROM a$r a JOIN v USING (vec_id) CROSS JOIN dims t
           |       GROUP BY a.cluster, t.i),
           |c${r + 1} AS MATERIALIZED (SELECT p.cid, coalesce(l.c, p.c) AS c
           |       FROM c$r p LEFT JOIN
           |         (SELECT cid, list(m ORDER BY i) AS c FROM m$r
           |          GROUP BY cid) l
           |         USING (cid))""".stripMargin
    }
    sb ++= distAssign(iters)
    sb.result()
  }

  private def kmeansOracleSql(k: Int, iters: Int, dim: Int): String =
    kmeansCtes(k, iters, dim) +
      s"""
         |SELECT vec_id, cluster FROM a$iters ORDER BY vec_id""".stripMargin

  /** DuckDB replay of [[graft.operators.Clustering.pcaProjectK]]: the
    * rounded global mean as a residual list `rv1` (x − m), then per
    * component c: the s18 power-round block run over `rv<c>`, and for
    * c+1 a deflated residual list rv<c+1> = rv<c> − (rv<c>·v_c) v_c.
    * Scores are each residual's projection onto its component —
    * exactly the quantity the fit iterated on. */
  private def pcaKOracleSql(k: Int, iters: Int, dim: Int): String = {
    val scoreCols = (1 to k).map(c =>
      s"""round(list_sum([rv$c.r[i] * p$c.pv[i]
         |    for i in generate_series(1, len(rv$c.r))]), 6) AS pc$c""".stripMargin)
    val joins = (2 to k).map(c => s"JOIN rv$c USING (vec_id)").mkString(" ")
    val ps = (1 to k).map(c => s"p${c}_$iters p$c").mkString(", ")
    pcaKCtes(k, iters, dim, tailResidual = false) +
      s"""
         |SELECT rv1.vec_id, ${scoreCols.mkString(",\n  ")}
         |FROM rv1 $joins, $ps ORDER BY rv1.vec_id""".stripMargin
  }

  /** s23's oracle: the residual AFTER the last component (rv<k+1>) is
    * what PCA could not explain; its squared norm is the per-row
    * reconstruction error. */
  private def pcaErrorOracleSql(k: Int, iters: Int, dim: Int): String =
    pcaKCtes(k, iters, dim, tailResidual = true) +
      s"""
         |SELECT vec_id,
         |  round(list_sum([e * e for e in r]), 6) AS err
         |FROM rv${k + 1} ORDER BY vec_id""".stripMargin

  private def pcaKCtes(k: Int, iters: Int, dim: Int,
                       tailResidual: Boolean): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH v AS (SELECT vec_id, embedding AS x FROM embeddings),
         |dims AS (SELECT i FROM generate_series(1, $dim) t(i)),
         |ml AS (SELECT t.i, round(avg(v.x[t.i]::DOUBLE), 6) AS m
         |       FROM v CROSS JOIN dims t GROUP BY t.i),
         |m AS (SELECT list(m ORDER BY i) AS mv FROM ml),
         |rv1 AS MATERIALIZED (SELECT vec_id,
         |        [x[i]::DOUBLE - mv[i] for i in generate_series(1, len(x))]
         |          AS r
         |       FROM v, m)""".stripMargin
    for (c <- 1 to k) {
      sb ++=
        s""",
           |p${c}_0 AS (SELECT [round(1/sqrt($dim), 6)
           |             for i in generate_series(1, $dim)] AS pv)""".stripMargin
      for (r <- 0 until iters) {
        sb ++=
          s""",
             |s${c}_$r AS (SELECT vec_id, list_sum([rv.r[i] * pv[i]
             |          for i in generate_series(1, len(rv.r))]) AS s
             |        FROM rv$c rv, p${c}_$r),
             |wl${c}_$r AS (SELECT t.i,
             |          round(sum(s.s * rv.r[t.i]), 5) AS w
             |         FROM s${c}_$r s JOIN rv$c rv USING (vec_id)
             |         CROSS JOIN dims t
             |         GROUP BY t.i),
             |w${c}_$r AS (SELECT list(w ORDER BY i) AS wv FROM wl${c}_$r),
             |p${c}_${r + 1} AS MATERIALIZED (SELECT CASE
             |          WHEN list_sum([w * w for w in wv]) = 0
             |          THEN [0.0 for w in wv]
             |          ELSE [round(w / sqrt(list_sum([w2 * w2 for w2 in wv])), 6)
             |                for w in wv]
             |        END AS pv FROM w${c}_$r)""".stripMargin
      }
      if (c < k || tailResidual) {
        sb ++=
          s""",
             |rv${c + 1} AS MATERIALIZED (SELECT t.vec_id,
             |        [t.r[i] - t.s * p.pv[i]
             |         for i in generate_series(1, len(t.r))] AS r
             |       FROM (SELECT rv.vec_id, rv.r,
             |               list_sum([rv.r[i] * p2.pv[i]
             |                 for i in generate_series(1, len(rv.r))]) AS s
             |             FROM rv$c rv, p${c}_$iters p2) t, p${c}_$iters p)""".stripMargin
      }
    }
    sb.result()
  }

  /** DuckDB replay of [[graft.operators.Clustering.pcaProject]]: the
    * rounded global mean, the rounded uniform start direction, then one
    * (per-row score, rounded w, next direction) block per power round —
    * w rounds to 5 decimals BEFORE the norm so both engines normalize
    * identical inputs — and the final rounded per-row projection. */
  private def pcaOracleSql(iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH v AS (SELECT vec_id, embedding AS x FROM embeddings),
         |dims AS (SELECT i FROM generate_series(1, $dim) t(i)),
         |ml AS (SELECT t.i, round(avg(v.x[t.i]::DOUBLE), 6) AS m
         |       FROM v CROSS JOIN dims t GROUP BY t.i),
         |m AS (SELECT list(m ORDER BY i) AS mv FROM ml),
         |p0 AS (SELECT [round(1/sqrt($dim), 6)
         |               for i in generate_series(1, $dim)] AS pv)""".stripMargin
    for (r <- 0 until iters) {
      sb ++=
        s""",
           |s$r AS (SELECT vec_id, list_sum([(x[i]::DOUBLE - mv[i]) * pv[i]
           |          for i in generate_series(1, len(x))]) AS s
           |        FROM v, m, p$r),
           |wl$r AS (SELECT t.i,
           |          round(sum(s.s * (v.x[t.i]::DOUBLE - m.mv[t.i])), 5) AS w
           |         FROM s$r s JOIN v USING (vec_id)
           |         CROSS JOIN m CROSS JOIN dims t
           |         GROUP BY t.i),
           |w$r AS (SELECT list(w ORDER BY i) AS wv FROM wl$r),
           |p${r + 1} AS MATERIALIZED (SELECT CASE
           |          WHEN list_sum([w * w for w in wv]) = 0
           |          THEN [0.0 for w in wv]
           |          ELSE [round(w / sqrt(list_sum([w2 * w2 for w2 in wv])), 6)
           |                for w in wv]
           |        END AS pv FROM w$r)""".stripMargin
    }
    sb ++=
      s"""
         |SELECT vec_id, round(list_sum([(x[i]::DOUBLE - mv[i]) * pv[i]
         |    for i in generate_series(1, len(x))]), 6) AS pc1
         |FROM v, m, p$iters ORDER BY vec_id""".stripMargin
    sb.result()
  }

  /** DuckDB oracle for [[Similarity.mmrRerank]] with query vec_id = 0 and
    * corpus vec_id >= 10: the candidate pool is the exact top-`fetch` by
    * cosine and each greedy round is one chained CTE (`LIMIT 1` argmax
    * with the same score-desc, id-asc tie-break). The lambda weights
    * arrive as decimal literals so both engines parse the same numbers. */
  private def mmrOracleSql(lambdaNum: String, penaltyNum: String,
                           fetch: Int, k: Int): String = {
    val cos = (a: String, b: String) =>
      s"""list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE
         |              for i in generate_series(1, len($a))]) /
         |    (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE
         |                    for i in generate_series(1, len($a))])) *
         |     sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE
         |                    for i in generate_series(1, len($b))])))""".stripMargin
    val head =
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |c AS (SELECT vec_id AS id, embedding AS cv FROM embeddings
         |      WHERE vec_id >= 10),
         |scored AS (
         |  SELECT id, ${cos("qv", "cv")} AS simq
         |  FROM c, q),
         |cand AS (SELECT id, simq FROM (
         |    SELECT id, simq, ROW_NUMBER() OVER (ORDER BY simq DESC, id) AS rn
         |    FROM scored) WHERE rn <= $fetch),
         |cv2 AS (SELECT c.id, c.cv, cand.simq FROM c JOIN cand USING (id)),
         |p AS (
         |  SELECT a.id AS ia, b.id AS ib, ${cos("a.cv", "b.cv")} AS s
         |  FROM cv2 a JOIN cv2 b ON a.id <> b.id),
         |s1 AS (SELECT id, $lambdaNum * simq AS score FROM cand
         |       ORDER BY score DESC, id LIMIT 1)""".stripMargin
    val rounds = (2 to k).map { i =>
      val sel = (1 until i).map(j => s"SELECT id FROM s$j").mkString(" UNION ALL ")
      s"""s$i AS (SELECT id, $lambdaNum * simq - $penaltyNum * (
         |         SELECT max(s) FROM p
         |         WHERE p.ia = cand.id AND p.ib IN ($sel)) AS score
         |       FROM cand WHERE id NOT IN ($sel)
         |       ORDER BY score DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val tail = (1 to k).map(i =>
      s"""SELECT CAST(0 AS BIGINT) AS query_id, $i AS rank, id,
         |  round(score, 4) + 0.0 AS score FROM s$i""".stripMargin)
      .mkString("\n", "\nUNION ALL ", "\nORDER BY rank")
    head + rounds + tail
  }
}

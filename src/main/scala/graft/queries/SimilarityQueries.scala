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
    "s2_ann_lsh" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.lshTopK(
            corpus = emb.where(col("vec_id") >= 10),
            queries = emb.where(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", k = 5, planes = 4)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      None),

    // ---- IVF-probed approximate top-k -----------------------------------
    "s4_ann_ivf" -> Q(
      (s, dir) => {
        val emb = Lake(s, dir).embeddings
        Similarity.ivfTopK(
            corpus = emb.where(col("vec_id") >= 10),
            queries = emb.where(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            planes = 4, nProbe = 2)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      None),

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
          |ORDER BY id_a, id_b""".stripMargin))
  )
}

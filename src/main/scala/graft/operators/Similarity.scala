package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline and scale path share one contract: top-k corpus neighbors per
  * query vector by cosine similarity, deterministic tie-break on id.
  *
  *  - [[bruteForceTopK]]: broadcast the (small) query set against the
  *    corpus scan — one pass over the corpus, no corpus shuffle, exact.
  *    This is the right plan even at 100 TB when |queries| is modest:
  *    cost is |corpus| x |queries| fused-codegen cosines and a
  *    per-partition top-k.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed once (cheap,
  *    deterministic, no stored model), queries probe only their own
  *    bucket. Recall < 1 traded for a |corpus|/2^planes candidate set.
  */
object Similarity {

  /** Exact top-k: per query row, the k most-cosine-similar corpus rows.
    * `queries`/`corpus` must expose (idCol, vecCol). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = Parallelism.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Pre-normalized exact top-k: the corpus is L2-normalized ONCE (in
    * practice: materialized once and reused across query batches —
    * normalization is the write-side cost, scoring drops to a bare dot
    * product). Rankings are identical to [[bruteForceTopK]]; the scored
    * value is the same cosine. */
  def bruteForceTopKPrenormed(corpus: DataFrame, queries: DataFrame,
                              idCol: String, vecCol: String, k: Int): DataFrame = {
    def normalize(v: Column): Column = {
      val n = sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, b) => a + b))
      when(n === 0.0, v.cast("array<double>"))
        .otherwise(transform(v, x => x.cast("double") / n))
    }
    val c = Parallelism.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), normalize(col(vecCol)).as("c_unit"))
    val q = queries
      .select(col(idCol).as("query_id"), normalize(col(vecCol)).as("q_unit"))
    val dot = aggregate(
      zip_with(col("q_unit"), col("c_unit"), (x, y) => x * y),
      lit(0.0), (a, b) => a + b)
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("sim", dot)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Approximate top-k: probe the query's LSH bucket. With p planes,
    * expected candidates = |corpus| / 2^p per probe.
    *
    * `multiProbe` is the recall lever: additionally probe the buckets at
    * Hamming distance 1 (each single hyperplane-bit flip, up to
    * `multiProbe` of them) — recall rises toward brute-force at the cost
    * of (1 + multiProbe) x candidates. Corpus rows own one bucket, so a
    * (query, neighbor) pair can surface at most once — no dedup stage. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, planes: Int = 4,
              multiProbe: Int = 0): DataFrame = {
    val c = Parallelism.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("bucket", lshBucket(col("c_vec"), planes))
    val probes = math.min(multiProbe, planes)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("__b", lshBucket(col("q_vec"), planes))
      .withColumn("bucket", explode(array(
        (col("__b") +: (0 until probes).map(p =>
          col("__b").bitwiseXOR(lit(1 << p)))): _*)))
      .drop("__b")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** IVF-style ANN: inverted lists with a learned-free coarse quantizer.
    *
    * The corpus is split into inverted lists (here: LSH buckets — at
    * production scale, k-means cells trained offline slot into the same
    * shape) and each list gets a centroid = element-wise mean vector.
    * A query ranks CENTROIDS by cosine and probes only the `nProbe`
    * nearest lists — unlike pure LSH, the probe set adapts to where the
    * query actually sits relative to the data rather than to its own
    * hash, which is what lifts recall at equal candidate volume.
    * Candidates then score exactly with the fused cosine. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 4, nProbe: Int = 2): DataFrame = {
    val c = Parallelism.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("bucket", lshBucket(col("c_vec"), planes))
    // centroid per list: element-wise mean via posexplode + re-assembly
    val centroids = c
      .select(col("bucket"), posexplode(col("c_vec")).as(Seq("pos", "x")))
      .groupBy("bucket", "pos").agg(avg(col("x")).as("m"))
      .groupBy("bucket")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(desc("c_sim"), asc("bucket"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim", cosineHof(
        transform(col("q_vec"), x => x.cast("double")), col("centroid")))
      .withColumn("c_rank", row_number().over(wProbe))
      .where(col("c_rank") <= nProbe)
      .select("query_id", "q_vec", "bucket")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    c.join(broadcast(probes), "bucket")
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Plane count that keeps expected LSH bucket occupancy near
    * `targetBucketRows` for a corpus of `n` rows: ceil(log2(n / target)),
    * clamped to [1, 24]. This is what makes the near-dup self-join volume
    * ~n * target instead of (n / 2^fixedPlanes)^2 — linear in corpus
    * size, the difference between a pair scan and a blowup at 100 TB. */
  def adaptivePlanes(n: Long, targetBucketRows: Long): Int = {
    require(targetBucketRows >= 1)
    val raw = math.log(math.max(1.0, n.toDouble / targetBucketRows)) / math.log(2.0)
    math.min(24, math.max(1, math.ceil(raw).toInt))
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine >= threshold.
    * Bucketed by LSH so the pair join is equi-keyed per bucket; exact
    * threshold check on candidates.
    *
    * `planes < 0` (default) adapts the bucket count to the corpus size
    * via [[adaptivePlanes]] (one cheap count job), so occupancy — and the
    * within-bucket join cost — stays bounded as the corpus grows instead
    * of re-quadratizing at a fixed 2^planes. `planes = 0` is the exact
    * all-pairs mode (the SQL-oracle-able configuration); explicit
    * `planes > 0` pins a bucket count.
    *
    * `tables` independent hyperplane families band the candidates the way
    * MinHash bands signatures: a qualifying pair is missed only if it
    * splits in EVERY table — miss probability (1-(1-θ/π)^p)^tables, driven
    * toward 0 for near-identical vectors (θ ~ 0) while unrelated pairs
    * stay filtered. Candidates are deduped before the exact cosine. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double = 0.95, planes: Int = -1,
                         targetBucketRows: Long = 2048,
                         tables: Int = 2): DataFrame = {
    require(tables >= 1)
    val v = Parallelism.ensure(df)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    val p = if (planes >= 0) planes else adaptivePlanes(v.count(), targetBucketRows)
    val nTables = if (p == 0) 1 else tables // single bucket: one table suffices
    val banded = v.select(col("id"), col("vec"),
      posexplode(array((0 until nTables).map(t =>
        lshBucket(col("vec"), p, t * p)): _*)).as(Seq("table", "bucket")))
    val a = banded.select(col("id").as("id_a"), col("vec").as("vec_a"),
      col("table"), col("bucket"))
    val b = banded.select(col("id").as("id_b"), col("vec").as("vec_b"),
      col("table"), col("bucket"))
    a.join(b, Seq("table", "bucket")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}

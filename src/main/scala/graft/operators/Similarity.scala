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
    val c = Parallelism.spread(corpus, 4L << 20)
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
    val c = Parallelism.spread(corpus, 4L << 20)
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
    val c = Parallelism.spread(corpus, 4L << 20)
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

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-cosine-similar corpus rows whose label DIFFERS from the query's
    * — the "hard" negatives that sit closest to the decision boundary.
    * Same broadcast-query shape as [[bruteForceTopK]] (one corpus pass,
    * no corpus shuffle) with the label-mismatch predicate applied before
    * ranking, so k survivors per query are guaranteed to be negatives. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_label"))
    val c = Parallelism.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col(labelCol).as("n_label"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    c.crossJoin(broadcast(q))
      .where(col("n_label") =!= col("q_label"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "n_label", "sim")
  }

  /** Deterministic random-negative sampling (the uniform half of a
    * contrastive pair generator): each corpus row draws `k` pseudo-random
    * other rows via the portable 60-bit md5 hash of (seed, anchor, j) —
    * the draw is a pure function of the key, so any engine (and any
    * re-run) regenerates the identical pair set, and the `+1 ... mod N`
    * offset construction provably never draws the anchor itself.
    * REQUIRES dense ids 0..max (the id space is probed as one 1-row
    * max() aggregate, broadcast — nothing driver-side). Collisions with
    * the anchor's label are flagged, not dropped — the standard
    * in-batch-negatives treatment, keeping exactly k draws per anchor. */
  def randomNegatives(corpus: DataFrame, idCol: String, labelCol: String,
                      k: Int, seed: Long): DataFrame = {
    // k < 1 would make sequence(0, k-1) run DESCENDING, not empty
    require(k > 0, s"k must be positive: $k")
    val nRow = corpus.agg((max(col(idCol)).cast("long") + 1L).as("__n"))
    val h = Dedup.md5Hash60(
      concat_ws(":", lit(seed), col("anchor_id"), col("j")))
    val drawn = Parallelism.ensure(corpus)
      .select(col(idCol).as("anchor_id"), col(labelCol).as("anchor_label"))
      .crossJoin(broadcast(nRow))
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("neg_id",
        pmod(col("anchor_id") + 1L + pmod(h, col("__n") - 1L), col("__n")))
    drawn
      .join(corpus.select(col(idCol).as("neg_id"), col(labelCol).as("neg_label")),
        "neg_id")
      .select(col("anchor_id"), col("j"), col("neg_id"), col("neg_label"),
        (col("neg_label") === col("anchor_label")).as("label_collision"))
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
  /** Element-wise mean vector per group, width-wise: one `avg` aggregate
    * per dimension in a SINGLE groupBy — map-side partial aggregation
    * collapses each partition to one row per cell before the shuffle, so
    * shuffle volume is cells x partitions x dim doubles regardless of
    * corpus size (the posexplode alternative fans every corpus row out
    * dim-fold and shuffles all of it). */
  private[graft] def meanVectorsWide(df: DataFrame, groupCol: String, vecCol: String,
                              outCol: String, dim: Int): DataFrame = {
    val avgs = (1 to dim).map(i =>
      avg(element_at(col(vecCol), i).cast("double")).as(s"__m$i"))
    df.groupBy(col(groupCol)).agg(avgs.head, avgs.tail: _*)
      .select(col(groupCol), array((1 to dim).map(i => col(s"__m$i")): _*).as(outCol))
  }

  /** Narrow per-row cell assignment against a driver-held centroid set:
    * argmax over dot products with the UNIT-normalized centroids (equal
    * to argmax over cosine — the row norm is a positive per-row constant
    * and drops out of the argmax; an all-zero vector dots 0 with every
    * centroid and falls to the smallest cell id, as the cosine form did).
    * Ties break to the smallest cell id via array_position's
    * first-occurrence semantics over the ascending-id centroid array. */
  private def argmaxCell(vec: Column, cents: Seq[(Int, Array[Double])]): Column = {
    val units: Seq[Seq[Double]] = cents.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (if (n == 0.0) v else v.map(_ / n)).toSeq
    }
    val ids: Seq[Int] = cents.map(_._1)
    val dots = transform(typedlit(units), u => dotHof(vec, u))
    element_at(typedlit(ids), array_position(dots, array_max(dots)).cast("int"))
  }

  /** Inverted-list training: `kmeansIters` Lloyd iterations (spherical
    * k-means: reassign each corpus vector to its most-cosine-similar
    * centroid, re-mean) over seed centroids hash-sampled from actual
    * corpus vectors — the offline "train the quantizer" step a
    * production IVF runs periodically.
    *
    * The centroid set is tiny BY CONSTRUCTION (at most 2^planes rows), so
    * it lives on the driver between iterations and each iteration is:
    * one narrow per-row argmax expression over the centroid literal (no
    * crossJoin row fan-out, no window shuffle) plus one width-wise mean
    * aggregation (map-side combined). Corpus data is never shuffled, and
    * the assignment lineage stays one expression deep regardless of
    * iteration count — no checkpoint needed. Above `maxLiteralCells` the
    * argmax literal would bloat codegen, so assignment falls back to a
    * broadcast centroid join reduced by one map-side-combined max_by
    * aggregation (shuffle rows = |corpus|, still no window, no fan-out
    * past the partial aggregate).
    *
    * Returns (assignments(neighbor_id, c_vec, bucket), centroids(bucket,
    * centroid)). Training re-balances occupancy when the data's cluster
    * structure doesn't align with random hyperplanes — bounded cells =
    * bounded candidate volume per probe at 100 TB. */
  private val maxLiteralCells = 1024

  private[graft] def trainCells(corpus: DataFrame, idCol: String, vecCol: String,
                                planes: Int, kmeansIters: Int): (DataFrame, DataFrame) = {
    val c0 = Parallelism.spread(corpus, 4L << 20)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    if (kmeansIters == 0) {
      // untrained cells are LSH buckets; one width-wise mean per cell
      val cells = c0.withColumn("bucket", lshBucket(col("c_vec"), planes))
      val dim = cells.select(size(col("c_vec"))).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(0)
      (cells, meanVectorsWide(cells, "bucket", "c_vec", "centroid", dim))
    } else {
      val spark = corpus.sparkSession
      import spark.implicits._
      // the seed fetch + every Lloyd round aggregates over the same
      // projected input: persist it for the fit's duration (guide §5),
      // unpersisted below before anything returns — per-round source
      // re-scans were iters+1 where one suffices. The RETURNED
      // assignment plan is built after the unpersist, so it reads the
      // source directly (no cross-call cached state).
      val c0fit = c0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
      // Seed from a deterministic hash-sample of ACTUAL corpus vectors:
      // LSH-bucket means can occupy far fewer than 2^planes cells when
      // the data's cluster structure straddles the hyperplanes, and
      // Lloyd iterations can rebalance cells but never create them —
      // seed count is the cell-count ceiling. orderBy+limit plans as
      // TakeOrderedAndProject (per-partition top-k, no global sort).
      var cents: Seq[(Int, Array[Double])] = c0
        .orderBy(xxhash64(col("neighbor_id")), col("neighbor_id"))
        .limit(1 << planes)
        .select(transform(col("c_vec"), x => x.cast("double")).as("v"))
        .collect()
        .zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](0).toArray }
        .toSeq
      if (cents.isEmpty) { // empty corpus: degenerate single empty cell
        val c = c0.withColumn("bucket", lit(0))
        return (c, c.select(col("bucket"),
          transform(col("c_vec"), x => x.cast("double")).as("centroid")).limit(0))
      }
      val dim = cents.head._2.length
      def assign(cs: Seq[(Int, Array[Double])]): DataFrame =
        if (cs.size <= maxLiteralCells)
          c0.withColumn("bucket", argmaxCell(col("c_vec"), cs))
        else {
          val units = cs.map { case (b, v) =>
            val n = math.sqrt(v.map(x => x * x).sum)
            (b, (if (n == 0.0) v else v.map(_ / n)).toSeq)
          }.toDF("bucket", "unit")
          c0.crossJoin(broadcast(units))
            .withColumn("__dot", dotHof(col("c_vec"), col("unit")))
            .groupBy("neighbor_id")
            .agg(first(col("c_vec")).as("c_vec"),
              max_by(col("bucket"), struct(col("__dot"), -col("bucket")))
                .as("bucket"))
            .select("neighbor_id", "c_vec", "bucket")
        }
      for (_ <- 0 until kmeansIters) {
        cents = meanVectorsWide(assign(cents), "bucket", "c_vec", "centroid", dim)
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
          .sortBy(_._1).toSeq
      }
      (assign(cents),
        cents.map { case (b, v) => (b, v.toSeq) }.toDF("bucket", "centroid"))
      } finally c0fit.unpersist(blocking = false)
    }
  }

  /** Cell assignment per corpus row — the materialize-the-index view of
    * [[trainCells]] (persist this + centroids; queries then only probe). */
  def ivfCells(corpus: DataFrame, idCol: String, vecCol: String,
               planes: Int = 4, kmeansIters: Int = 0): DataFrame =
    trainCells(corpus, idCol, vecCol, planes, kmeansIters)._1
      .select(col("neighbor_id").as(idCol), col("bucket"))

  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 4, nProbe: Int = 2,
              kmeansIters: Int = 0): DataFrame = {
    val (c, centroids) = trainCells(corpus, idCol, vecCol, planes, kmeansIters)
    ivfTopKFrom(c, centroids, queries, idCol, vecCol, k, nProbe)
  }

  /** [[ivfTopK]] in LSH mode against a PRE-TRAINED centroid table: the
    * cell assignment is re-derived in-plan from the raw corpus (one
    * deterministic expression, no shuffle), but the probe ranking uses
    * the supplied centroids instead of re-running the width-wise mean
    * aggregation — for a corpus whose quantizer is already materialized
    * (e.g. a just-built [[VectorIndex]], whose kmeansIters=0 training is
    * deterministic), the duplicate centroid aggregate and its dim-probe
    * action drop out of the plan (guide §1.2/§5). */
  def ivfTopKPreTrained(corpus: DataFrame, centroids: DataFrame,
                        queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, planes: Int, nProbe: Int): DataFrame = {
    val c = Parallelism.spread(corpus, 4L << 20)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("bucket", lshBucket(col("c_vec"), planes))
    ivfTopKFrom(c, centroids, queries, idCol, vecCol, k, nProbe)
  }

  /** Probe-and-rank stage shared by [[ivfTopK]] and [[ivfTopKPreTrained]]:
    * rank centroids per query (tiny broadcast), probe the `nProbe` best
    * buckets, exact-rank within the probed cells. */
  private def ivfTopKFrom(c: DataFrame, centroids: DataFrame,
                          queries: DataFrame, idCol: String, vecCol: String,
                          k: Int, nProbe: Int): DataFrame = {
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

  /** Deterministic cluster id from the sign pattern of the first `dims`
    * vector components — the SQL-portable stand-in for a trained cluster
    * assignment (axis-aligned hyperplanes instead of seeded random ones). */
  def signBucket(v: Column, dims: Int): Column = {
    require(dims >= 1 && dims <= 30)
    (0 until dims).map(i =>
      when(element_at(v, i + 1) >= 0f, lit(1 << i)).otherwise(lit(0)): Column)
      .reduce(_ + _)
  }

  /** SemDedup-style semantic deduplication (cluster-then-prune, after
    * Abbas et al. 2023, arXiv:2303.09540): partition the embedding corpus
    * into clusters, then WITHIN each cluster drop every vector that has a
    * smaller-id neighbor at cosine >= `threshold`. Cross-cluster pairs
    * are never compared — that locality is the semantics (and the scale
    * lever): the pair join is keyed on the cluster id, so candidate
    * volume is sum(cluster_size^2), never corpus^2.
    *
    * The drop rule ("any smaller-id neighbor, kept or not") is the
    * transitive-chain-safe greedy variant — deterministic, order-free,
    * one shot; no iterative connected components needed.
    *
    * `signDims` picks 2^dims [[signBucket]] clusters (SQL-portable, what
    * the s6 oracle replays). Production corpora swap in trained cells
    * ([[ivfCells]]) via `clusters`: any (id, cluster) frame works, and
    * dims should grow with the corpus like [[adaptivePlanes]] so cluster
    * occupancy — and with it the self-join fan-out — stays bounded. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               threshold: Double, signDims: Int = 2,
               clusters: Option[DataFrame] = None): DataFrame = {
    val e0 = Parallelism.ensure(df)
    val e = clusters match {
      case Some(c) => e0.select(col(idCol), col(vecCol)).join(c, Seq(idCol))
      case None => e0.select(col(idCol), col(vecCol),
        signBucket(col(vecCol), signDims).as("cluster"))
    }
    val a = e.select(col("cluster"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = e.select(col("cluster"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val losers = a.join(b, "cluster")
      .where(col("id_a") < col("id_b"))
      .where(cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    e.select(col(idCol), col("cluster"))
      .join(losers, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("__dropped").isNull.as("kept"))
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

  /** Semantic decontamination: flag every corpus row with ANY benchmark
    * vector at cosine >= `threshold` — the embedding-space complement of
    * the n-gram [[Dedup.decontaminate]] (d11), catching paraphrased or
    * reformatted benchmark leakage that shares no 8-gram. Returns the
    * corpus with a `contaminated` boolean appended.
    *
    * Candidate generation is [[cosineNearDupPairs]]'s banded LSH (miss
    * only if a pair splits in every table; `planes = 0` = exact single
    * bucket, the SQL-oracle-able mode; `planes < 0` adapts to corpus
    * size). The exact cosine filter runs on every candidate, so false
    * POSITIVES are impossible at any planes — ANN only trades recall.
    * The benchmark side is typically tiny (an eval set), so its banded
    * copy broadcasts and the probe is one map-side join; the corpus is
    * never self-joined. */
  def semanticDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double = 0.9, planes: Int = -1,
                            targetBucketRows: Long = 2048,
                            tables: Int = 2): DataFrame = {
    require(tables >= 1)
    val v = Parallelism.ensure(corpus)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    val p = if (planes >= 0) planes else adaptivePlanes(v.count(), targetBucketRows)
    val nTables = if (p == 0) 1 else tables
    def banded(df: DataFrame): DataFrame = df.select(col("id"), col("vec"),
      posexplode(array((0 until nTables).map(t =>
        lshBucket(col("vec"), p, t * p)): _*)).as(Seq("table", "bucket")))
    val c = banded(v)
    val b = banded(benchmark.select(lit(0L).as("id"), col(vecCol).as("vec")))
      .select(col("vec").as("b_vec"), col("table"), col("bucket"))
    // hits key under a reserved name: drop-by-name ("id") would also
    // remove the CALLER's column when idCol is literally "id"
    val hits = c.join(broadcast(b), Seq("table", "bucket"))
      .where(cosine(col("vec"), col("b_vec")) >= threshold)
      .select(col("id").as("__decon_id")).distinct()
      .withColumn("__hit", lit(true))
    corpus.join(hits, corpus(idCol) === hits("__decon_id"), "left_outer")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__decon_id", "__hit")
  }

  /** A candidate-generation stage for [[mmrRerank]]: (corpus, queries,
    * idCol, vecCol, fetch) → a frame with `(query_id, neighbor_id, sim)`
    * columns — the shared output shape of [[bruteForceTopK]],
    * [[bruteForceTopKPrenormed]] and [[lshTopK]]. Extra parameters bind
    * by partial application, e.g.
    * `Similarity.lshTopK(_, _, _, _, _, planes = 8, multiProbe = 2)`. */
  type CandidateFetcher = (DataFrame, DataFrame, String, String, Int) => DataFrame

  /** Maximal Marginal Relevance re-ranking (diversity-aware retrieval):
    * per query, greedily pick k results maximizing
    * `lambda * sim(q, d) - (1 - lambda) * max over selected s of sim(d, s)`
    * (empty-selection penalty = 0), ties to the smaller id — relevance
    * traded against redundancy, the standard rerank between ANN
    * retrieval and a training-batch / RAG consumer. Returns
    * `(query_id, rank, id, score)`; when a query's candidate pool holds
    * fewer than k rows the greedy stops at the pool, so a small corpus
    * degrades to fewer rows rather than an error.
    *
    * `candidates` is the PLUGGABLE retrieval stage: exact
    * [[bruteForceTopK]] by default, [[lshTopK]] (partially applied with
    * its planes/probes) as the documented ANN path at scale — the rerank
    * is agnostic to how the pool was fetched.
    *
    * Scale shape: the DISTRIBUTED stage is the corpus-wide top-`fetch`
    * retrieval; the greedy then runs on the driver over a
    * PARAMETER-bounded working set — `fetch` candidates + their `fetch`²
    * pairwise sims PER QUERY (20 + 400 rows at the defaults, times a
    * query set the fetchers already broadcast), the same gated-fetch
    * budget as the IVF centroid table, never a function of corpus size.
    * All similarity arithmetic happens in Spark expressions (one
    * codegen'd pass), the driver only compares the resulting doubles. */
  def mmrRerank(corpus: DataFrame, query: DataFrame, idCol: String,
                vecCol: String, k: Int = 5, fetch: Int = 20,
                lambda: Double = 0.7,
                candidates: CandidateFetcher = bruteForceTopK,
                maxQueries: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(fetch >= k, s"fetch ($fetch) must be >= k ($k)")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    // the driver-side greedy is bounded by |queries| * fetch^2 — make the
    // broadcast-sized-query-set assumption a CHECKED contract so an
    // oversized query frame fails with an actionable error, not an OOM
    val nQueries = query.count()
    require(nQueries <= maxQueries,
      s"mmrRerank collects fetch^2 rows per query on the driver; got " +
        s"$nQueries query rows > maxQueries=$maxQueries. Rerank per " +
        s"query batch, or raise maxQueries if driver memory allows.")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cand = candidates(corpus, query, idCol, vecCol, fetch)
      .select(col("query_id"), col("neighbor_id").as("id"), col("sim").as("simq"))
    val cv = cand
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "id")
    // pairwise sims WITHIN each query's candidate pool (pools of
    // different queries never mix — the round-6 blended-ranking bug)
    val pairs = cv.select(col("query_id"), col("id").as("ia"), col("v").as("va"))
      .join(broadcast(cv.select(col("query_id"), col("id").as("ib"), col("v").as("vb"))),
        Seq("query_id"))
      .where(col("ia") =!= col("ib"))
      .select(col("query_id"), col("ia"), col("ib"),
        cosine(col("va"), col("vb")).as("s"))
    // parameter-bounded fetches per query: `fetch` rows + fetch*(fetch-1)
    // pairs, times the (broadcast-sized) query count
    val simqByQ = cand.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val pairSimByQ = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3) -> t._4).toMap).toMap
    val out = simqByQ.toSeq.sortBy(_._1).flatMap { case (qid, simq) =>
      val pairSim = pairSimByQ.getOrElse(qid, Map.empty[(Long, Long), Double])
      val selected = collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (selected.size < math.min(k, simq.size)) {
        val chosen = selected.map(_._1).toSet
        val best = simq.keysIterator.filterNot(chosen)
          .map { id =>
            val penalty =
              if (chosen.isEmpty) 0.0
              else chosen.iterator.map(s => pairSim((id, s))).max
            id -> (lambda * simq(id) - (1 - lambda) * penalty)
          }
          .minBy { case (id, score) => (-score, id) }
        selected += best
      }
      selected.toSeq.zipWithIndex.map { case ((id, score), i) =>
        val rounded = BigDecimal(score)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        (qid, i + 1, id, rounded)
      }
    }
    out.toDF("query_id", "rank", "id", "score")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse N retrieval rankings — e.g. a lexical BM25 list and an
    * embedding-cosine list, the standard hybrid-search combiner — into
    * one score per id: `rrf(d) = Σ_lists 1/(kRrf + rank_list(d))`. An id
    * absent from a list simply contributes nothing (the standard
    * convention); `n_lists` reports how many lists surfaced each id.
    *
    * Each input frame carries `(idCol, rankCol)` with rank 1-based.
    * Scale shape: one union of the candidate LISTS + one hash aggregate
    * on id — fusion cost is Σ|lists| (k-bounded by the retrievers),
    * independent of corpus size. Determinism: with ≤2 lists the
    * two-term double sum is order-independent (IEEE addition is
    * commutative); with more lists, round the result before comparing
    * across engines. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kRrf >= 1, s"kRrf must be >= 1: $kRrf")
    rankings
      .map(_.select(col(idCol), col(rankCol).cast("int").as("__r")))
      .reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(sum(lit(1.0) / (lit(kRrf) + col("__r"))).as("rrf"),
        count(lit(1)).as("n_lists"))
  }

  /** Product quantization (PQ): split each D-dim vector into `m`
    * contiguous subvectors, k-means each subspace independently
    * (2^planes centroids via the deterministic hash-seeded
    * [[trainCells]] machinery), and represent a vector as its m small
    * codes — m·planes bits instead of 32·D (64 float dims at the
    * defaults compress 128× into one 16-bit code word). Returns per
    * vector: (id, codes, recon_cos) where `codes` is the m-element code
    * array and `recon_cos` the cosine between the original and its
    * decoded (centroid-concatenation) reconstruction — the measurable
    * quality the codebook trades for the compression.
    *
    * Scale shape: m bounded driver iterations, each a [[trainCells]]
    * run (hash-seeded centroid fetch bounded by 2^planes, Lloyd rounds
    * as broadcast-argmax assignments), then m id-keyed hash joins to
    * stitch codes and reconstructions — everything per-row or
    * centroid-bounded, nothing pairwise. */
  def pqReconstruction(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int = 4, planes: Int = 4,
                       kmeansIters: Int = 2): DataFrame = {
    require(m >= 1, s"m must be >= 1: $m")
    require(planes >= 0, s"planes must be >= 0: $planes")
    val dim = corpus.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim == 0 || dim % m == 0,
      s"dim $dim does not split into $m equal subspaces")
    val sub = if (m == 0) 0 else dim / m
    val parts = (0 until m).map { j =>
      val s = corpus.select(col(idCol).as("id"),
        slice(col(vecCol), j * sub + 1, sub).as("sv"))
      val (cells, cents) = trainCells(s, "id", "sv", planes, kmeansIters)
      // decode through a literal bucket->centroid map instead of a join
      // back onto the (same-lineage) cells plan: the codebook is ≤
      // 2^planes rows — the same bounded driver fetch trainCells itself
      // already makes — and the literal keeps each subspace branch a
      // pure per-row map over its own scan
      val codebook = cents.collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cells.select(col("neighbor_id").as("id"),
        col("bucket").cast("int").as(s"code_$j"),
        element_at(typedLit(codebook), col("bucket").cast("int")).as(s"dec_$j"))
    }
    val joined = parts.reduce((a, b) => a.join(b, "id"))
    val decoded = concat((0 until m).map(j => col(s"dec_$j")): _*)
    joined
      .join(corpus.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("orig")), "id")
      .select(col("id"),
        array((0 until m).map(j => col(s"code_$j")): _*).as("codes"),
        cosine(col("orig"), decoded).as("recon_cos"))
  }
}

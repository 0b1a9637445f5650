package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deterministic, engine-portable clustering + dimensionality reduction
  * over an `array<float>` embedding column — the two classic corpus
  * organization steps an LLM-data pipeline runs after embedding
  * (cluster-balanced sampling, SemDedup-style cluster pruning, PCA-based
  * whitening/outlier scoring).
  *
  * Both operators follow the engine's BPE playbook (`Tokenizer.bpeTrain`)
  * for making an ITERATIVE fit exactly replayable by a SQL oracle:
  * a fixed number of rounds, and every cross-row aggregate that feeds
  * the next round is ROUNDED to a fixed decimal grid before use. Within
  * a round, all per-row arithmetic is a left-to-right float→double fold
  * (the portable order `VectorFunctions.cosineHof` established), so both
  * engines walk bit-identical state between roundings; the rounding
  * collapses the only nondeterminism there is — partial-aggregation
  * order in distributed sums (~1 ulp), which sits ten orders of
  * magnitude under the rounding step.
  *
  * Scale design (the part that must survive 100 TB):
  *  - Driver state is O(k·dim) / O(dim) doubles — model size, never data
  *    size. Corpus rows are NEVER shuffled: each round is one narrow
  *    per-row expression over centroid/direction literals plus ONE
  *    map-side-combined aggregation (k·dim or dim cells), exactly the
  *    [[Similarity.trainCells]] shape.
  *  - Lineage depth stays constant across rounds (assignments are a
  *    single expression over literals, not an iterated join), so no
  *    checkpointing is needed no matter how many rounds run.
  *  - [[pcaFit]] is MATRIX-FREE: it never materializes the dim×dim
  *    covariance. Each power-iteration round computes X'(Xv) as a
  *    per-row dot product followed by one dim-cell aggregate — O(n·dim)
  *    work, O(dim) shuffle bytes — where the Gram-matrix route would
  *    explode every row dim² -fold before aggregating.
  */
object Clustering {

  private def roundTo(x: Double, decimals: Int): Double =
    BigDecimal(x).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Σ (x_i - c_i)² with float→double left fold — the portable order.
    * Reference/law-spec form of the fused [[graft.plans.NearestCentroidExpr]]
    * distance (VectorKernelSpec pins bit-equality). */
  private[graft] def l2sqHof(x: Column, c: Seq[Double]): Column =
    aggregate(
      zip_with(x, typedlit(c), (a, b) =>
        (a.cast(DoubleType) - b) * (a.cast(DoubleType) - b)),
      lit(0.0), (acc, v) => acc + v)

  /** Σ (x_i - m_i)·v_i, same fold order as the SQL oracle's
    * `list_sum([(x[i] - m[i]) * v[i] ...])`. Fused codegen kernel
    * ([[graft.plans.CenteredDotExpr]]); [[centeredDotHof]] is the
    * law-spec reference. */
  private def centeredDot(x: Column, m: Seq[Double], v: Seq[Double]): Column =
    graft.plans.VectorKernelExprs.centeredDot(x, m, v)

  /** The interpreted HOF form [[centeredDot]] replaced (guide §4):
    * kept as the bit-equality oracle for VectorKernelSpec. */
  private[graft] def centeredDotHof(x: Column, m: Seq[Double],
                                        v: Seq[Double]): Column =
    aggregate(
      zip_with(
        zip_with(x, typedlit(m), (a, b) => a.cast(DoubleType) - b),
        typedlit(v), (a, b) => a * b),
      lit(0.0), (acc, p) => acc + p)

  /** struct(cluster, dist) of the nearest centroid by rounded squared
    * L2: distance rounded to `distDecimals` so borderline argmin
    * comparisons cannot differ across engines, ties to the SMALLEST
    * cluster id (first-minimum semantics; `cents` is ascending by id).
    * Fused codegen kernel ([[graft.plans.NearestCentroidExpr]]) — the
    * previous form built k interpreted zip_with/fold distances plus
    * array_min/array_position per row. [[nearestHof]] is the law-spec
    * reference. */
  private def nearestStruct(x: Column, cents: Seq[Array[Double]],
                            distDecimals: Int): Column =
    graft.plans.VectorKernelExprs.nearestCentroid(
      x, cents.map(_.toSeq), distDecimals)

  /** Nearest-centroid id (0-based). */
  private def nearest(x: Column, cents: Seq[Array[Double]],
                      distDecimals: Int): Column =
    nearestStruct(x, cents, distDecimals).getField("cluster")

  /** The composable form [[nearest]]/[[nearestStruct]] replaced:
    * law-spec reference for the kernel's cluster AND dist halves. */
  private[graft] def nearestHof(x: Column, cents: Seq[Array[Double]],
                                    distDecimals: Int): Column = {
    val dists = array(cents.map(c => round(l2sqHof(x, c.toSeq), distDecimals)): _*)
    struct(
      (array_position(dists, array_min(dists)) - 1).cast("long").as("cluster"),
      array_min(dists).as("dist"))
  }

  private def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Persist `df` for the duration of an iterative fit, unpersist after.
    *
    * Every fit below runs `iters` aggregate jobs over the SAME projected
    * input; without this, each round re-reads the source parquet and
    * re-pays [[Parallelism.ensure]]'s spreading shuffle — `iters + 2`
    * scans where one suffices (guide §2.4/§5: a DataFrame reused across
    * jobs whose recomputation costs a scan each round is the textbook
    * persist case; at 100 TB the fit input is the narrow (id, vec)
    * projection, spilling to disk beats N source scans). The cache
    * lives strictly WITHIN one fit call — unpersisted in `finally`
    * before anything returns — so a bench rep or oracle run never sees
    * another run's materialized state. */
  private def withFitCache[A](df: DataFrame)(body: DataFrame => A): A = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(cached) finally cached.unpersist(blocking = false)
  }

  /** Lloyd k-means, fully deterministic and oracle-replayable:
    *  - init: the vectors of the `k` smallest ids, elements rounded to
    *    `meanDecimals` (seeding from actual data rows, the standard
    *    trick to avoid empty initial cells; smallest-ids rather than a
    *    hash sample so a SQL oracle can state it as ORDER BY id LIMIT k);
    *  - `iters` rounds of { assign to nearest rounded centroid (squared
    *    L2, rounded, ties to smallest id) ; re-mean, each coordinate
    *    rounded to `meanDecimals` }. A cluster that loses every member
    *    KEEPS its previous centroid (deterministic, and mirrors the
    *    LEFT JOIN + coalesce a SQL replay writes naturally).
    *
    * Returns the final centroids, ascending by cluster id. Driver cost:
    * `iters` jobs, each collecting ≤ k rows of dim doubles. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      meanDecimals: Int = 6,
                      distDecimals: Int = 9): Seq[Array[Double]] = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 0, "iters must be >= 0")
    withFitCache(Parallelism.spread(df, 4L << 20)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"))) { c0 =>
    val dim = dimOf(c0, "__v")
    if (dim == 0) return Seq.empty
    // seed: the k smallest ids' vectors — TakeOrderedAndProject, no sort
    var cents: Seq[Array[Double]] = c0.orderBy("__id").limit(k)
      .select(transform(col("__v"), x => x.cast(DoubleType)).as("v"))
      .collect()
      .map(_.getSeq[Double](0).map(roundTo(_, meanDecimals)).toArray)
      .toSeq
    if (cents.isEmpty) return Seq.empty
    val avgs = (1 to dim).map(i =>
      round(avg(element_at(col("__v"), i).cast(DoubleType)), meanDecimals)
        .as(s"__m$i"))
    for (_ <- 0 until iters) {
      val means: Map[Long, Array[Double]] = c0
        .withColumn("__cl", nearest(col("__v"), cents, distDecimals))
        .groupBy("__cl").agg(avgs.head, avgs.tail: _*)
        .collect()
        .map(r => r.getLong(0) ->
          (1 to dim).map(i => r.getDouble(i)).toArray)
        .toMap
      cents = cents.zipWithIndex.map { case (prev, cid) =>
        means.getOrElse(cid.toLong, prev) // empty cluster keeps centroid
      }
    }
    cents
    }
  }

  /** Final assignment `(idCol, cluster)` of every row to its nearest
    * trained centroid — one narrow expression over the centroid
    * literals, no join, no shuffle. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int,
                   meanDecimals: Int = 6,
                   distDecimals: Int = 9): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters,
      meanDecimals, distDecimals)
    if (cents.isEmpty)
      return df.select(col(idCol), lit(0L).as("cluster")).limit(0)
    assignTo(df, idCol, vecCol, cents, distDecimals)
  }

  /** Assignment against an already-trained centroid seq — the
    * frozen-model serving path ([[graft.streaming.ClusterStream]]'s
    * batch/streaming-shared expression; works on streaming frames
    * because it is a bare projection). */
  def assignTo(df: DataFrame, idCol: String, vecCol: String,
               centroids: Seq[Array[Double]],
               distDecimals: Int = 9): DataFrame = {
    require(centroids.nonEmpty, "assignTo needs at least one centroid")
    df.select(col(idCol),
      nearest(col(vecCol), centroids, distDecimals).as("cluster"))
  }

  /** Per-row distance diagnostics `(idCol, cluster, dist)` against the
    * trained centroids: `dist` is the same rounded squared-L2 the
    * assignment argmin ranks (so cluster and dist are consistent by
    * construction). The embedding-outlier signal: a row far from every
    * centroid is far from its OWN centroid, so ranking on `dist`
    * surfaces corrupt/off-distribution vectors for curation review.
    * One narrow pass, top-k consumers plan as TakeOrderedAndProject. */
  def centroidDistances(df: DataFrame, idCol: String, vecCol: String,
                        k: Int, iters: Int,
                        meanDecimals: Int = 6,
                        distDecimals: Int = 9): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters,
      meanDecimals, distDecimals)
    if (cents.isEmpty)
      return df.select(col(idCol), lit(0L).as("cluster"),
        lit(0.0).as("dist")).limit(0)
    df.select(col(idCol), nearestStruct(col(vecCol), cents, distDecimals).as("__n"))
      .select(col(idCol),
        col("__n").getField("cluster").as("cluster"),
        col("__n").getField("dist").as("dist"))
  }

  /** Per-dimension z-score standardization summary `(idCol, z_min,
    * z_max, z_norm)`: each coordinate scaled by the corpus's
    * per-dimension mean and population stddev — the whitening
    * diagnostic a feature pipeline runs before distance-based
    * processing (a |z| far outside its peers flags a broken dimension
    * or a corrupt row). The moments publish ROUNDED (mean and
    * mean-of-squares at `momentDecimals`, sd composed from the rounded
    * pieces), so both engines scale with identical constants; a
    * zero-variance dimension standardizes to 0. One aggregate of
    * 2·dim cells, then one narrow pass. */
  def standardize(df: DataFrame, idCol: String, vecCol: String,
                  momentDecimals: Int = 6,
                  outDecimals: Int = 6): DataFrame = {
    val c0 = Parallelism.spread(df, 4L << 20)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val dim = dimOf(c0, "__v")
    if (dim == 0)
      return df.select(col(idCol), lit(0.0).as("z_min"),
        lit(0.0).as("z_max"), lit(0.0).as("z_norm")).limit(0)
    val aggCols =
      (1 to dim).map(i =>
        round(avg(element_at(col("__v"), i).cast(DoubleType)),
          momentDecimals).as(s"__m$i")) ++
        (1 to dim).map(i =>
          round(avg(element_at(col("__v"), i).cast(DoubleType) *
            element_at(col("__v"), i).cast(DoubleType)),
            momentDecimals).as(s"__q$i"))
    val row = c0.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val m = (0 until dim).map(row.getDouble).toArray
    val sd = (0 until dim).map { i =>
      val q = row.getDouble(dim + i)
      roundTo(math.sqrt(math.max(0.0, q - m(i) * m(i))), momentDecimals)
    }.toArray
    // z_i = (x_i − m_i)/sd_i (0 where sd_i = 0), folded left-to-right
    val z = zip_with(
      zip_with(col(vecCol), typedlit(m.toSeq),
        (a, b) => a.cast(DoubleType) - b),
      typedlit(sd.toSeq),
      (c, s) => when(s === 0.0, 0.0).otherwise(c / s))
    df.select(col(idCol),
      round(array_min(z), outDecimals).as("z_min"),
      round(array_max(z), outDecimals).as("z_max"),
      round(sqrt(aggregate(transform(z, e => e * e),
        lit(0.0), (acc, p) => acc + p)), outDecimals).as("z_norm"))
  }

  /** Uncentered-data-safe PCA-1 by power iteration: the top principal
    * direction of the MEAN-CENTERED data, fit matrix-free.
    *
    * Each round computes w = X'c (Xc v) in two steps — a per-row score
    * s_r = (x_r - m)·v (expression only, no job) and one aggregate of
    * dim sums w_j = Σ_r s_r (x_rj - m_j) — then publishes the next
    * direction v' = round(w / ‖w‖). `w` is rounded to `wDecimals`
    * BEFORE the norm, so both engines normalize bit-identical inputs
    * and everything after the rounding is deterministic on both sides.
    * A zero `w` (data with no variance) publishes the zero vector.
    *
    * Start direction: uniform 1/√dim (rounded) — deterministic, and
    * orthogonal to no coordinate axis, so it cannot start perpendicular
    * to a principal axis that any single feature participates in.
    * `iters` is FIXED, not convergence-tested: the contract is "the
    * deterministic result of `iters` rounds", which is what makes the
    * fit replayable; convergence quality is the caller's lever.
    *
    * Returns (mean, direction), each dim doubles. */
  def pcaFit(df: DataFrame, vecCol: String, iters: Int = 8,
             meanDecimals: Int = 6, wDecimals: Int = 5,
             vDecimals: Int = 6): (Array[Double], Array[Double]) = {
    require(iters >= 0, "iters must be >= 0")
    withFitCache(Parallelism.spread(df, 4L << 20).select(col(vecCol).as("__v"))) { c0 =>
    val dim = dimOf(c0, "__v")
    if (dim == 0) return (Array.empty, Array.empty)
    val meanRow = c0.agg(
      round(avg(element_at(col("__v"), 1).cast(DoubleType)), meanDecimals)
        .as("__m1"),
      (2 to dim).map(i =>
        round(avg(element_at(col("__v"), i).cast(DoubleType)), meanDecimals)
          .as(s"__m$i")): _*)
      .collect()(0)
    val m = (0 until dim).map(meanRow.getDouble).toArray
    var v = Array.fill(dim)(roundTo(1.0 / math.sqrt(dim), vDecimals))
    for (_ <- 0 until iters) {
      val s = centeredDot(col("__v"), m.toSeq, v.toSeq)
      val wRow = c0.withColumn("__s", s).agg(
        round(sum(col("__s") *
          (element_at(col("__v"), 1).cast(DoubleType) - m(0))), wDecimals)
          .as("__w1"),
        (2 to dim).map(i =>
          round(sum(col("__s") *
            (element_at(col("__v"), i).cast(DoubleType) - m(i - 1))),
            wDecimals).as(s"__w$i")): _*)
        .collect()(0)
      val w = (0 until dim).map(i =>
        if (wRow.isNullAt(i)) 0.0 else wRow.getDouble(i)).toArray
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm == 0.0) Array.fill(dim)(0.0)
          else w.map(x => roundTo(x / norm, vDecimals))
    }
    (m, v)
    }
  }

  /** Per-row projection `(idCol, pc1)` onto the fitted direction —
    * after the fit, one narrow pass over the corpus. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 iters: Int = 8, scoreDecimals: Int = 6): DataFrame = {
    val (m, v) = pcaFit(df, vecCol, iters)
    if (m.isEmpty)
      return df.select(col(idCol), lit(0.0).as("pc1")).limit(0)
    df.select(col(idCol),
      round(centeredDot(col(vecCol), m.toSeq, v.toSeq), scoreDecimals)
        .as("pc1"))
  }

  /** Top-`k` principal directions by power iteration WITH DEFLATION:
    * component j is fit on the residual left after subtracting every
    * earlier component's projection (r_j = r_{j-1} − (r_{j-1}·v_{j-1})
    * v_{j-1}, starting from the mean-centered rows). Each fit is the
    * [[pcaFit]] loop verbatim — uniform rounded start, w rounded to
    * `wDecimals` before the norm, direction rounded to `vDecimals` —
    * run over a materialized residual column, so the whole k-component
    * fit stays exactly replayable (s22's oracle chains k blocks of the
    * s18 CTE rounds over successive residual lists). k=1 equals
    * [[pcaFit]] bit for bit (law-pinned in ClusteringSpec).
    *
    * Same matrix-free scale shape, ×k: per round one narrow expression
    * pass + one dim-cell aggregate; the residual is an expression over
    * (x, m, v_1..v_{j-1}) literals — never materialized to storage,
    * and driver state stays O(k·dim). */
  def pcaFitK(df: DataFrame, vecCol: String, k: Int, iters: Int = 8,
              meanDecimals: Int = 6, wDecimals: Int = 5,
              vDecimals: Int = 6): (Array[Double], Seq[Array[Double]]) = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 0, "iters must be >= 0")
    withFitCache(Parallelism.spread(df, 4L << 20).select(col(vecCol).as("__v"))) { c0 =>
    val dim = dimOf(c0, "__v")
    if (dim == 0) return (Array.empty, Seq.empty)
    val meanRow = c0.agg(
      round(avg(element_at(col("__v"), 1).cast(DoubleType)), meanDecimals)
        .as("__m1"),
      (2 to dim).map(i =>
        round(avg(element_at(col("__v"), i).cast(DoubleType)), meanDecimals)
          .as(s"__m$i")): _*)
      .collect()(0)
    val m = (0 until dim).map(meanRow.getDouble).toArray
    val centered = zip_with(col("__v"), typedlit(m.toSeq),
      (a, b) => a.cast(DoubleType) - b)
    def gram(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def dotC(v: Array[Double]): Column = aggregate(
      zip_with(col("__c"), typedlit(v.toSeq), (a, b) => a * b),
      lit(0.0), (acc, p) => acc + p)
    var components = Seq.empty[Array[Double]]
    for (_ <- 0 until k) {
      // The residual never materializes: with prior scores
      // s_l = (c·v_l) − Σ_{p<l} s_p (v_p·v_l) as flat per-row columns,
      //   round score  s = (c·v) − Σ_l s_l (v_l·v)
      //   w_i          = Σ_r s·c_i − Σ_l v_l,i · Σ_r s·s_l
      // i.e. ONE aggregate of dim + |priors| flat sums per round, and
      // the driver combines with the component literals. (The explicit
      // residual-column form re-evaluated inner dot products per
      // element through the HOF lambdas — measured 4× slower with k=2
      // and growing with k.) Float order differs from the explicit
      // form by ~1 ulp per term; the 5-decimal w rounding absorbs it —
      // the same margin the distributed-sum nondeterminism already
      // rides.
      val priors = components
      val base0 = c0.select(centered.as("__c"))
      val withP = priors.indices.foldLeft(base0) { (f, l) =>
        val corrected = (0 until l).foldLeft(dotC(priors(l))) { (e, p) =>
          e - col(s"__p$p") * lit(gram(priors(p), priors(l)))
        }
        f.withColumn(s"__p$l", corrected)
      }
      var v = Array.fill(dim)(roundTo(1.0 / math.sqrt(dim), vDecimals))
      for (_ <- 0 until iters) {
        val s = priors.indices.foldLeft(dotC(v)) { (e, l) =>
          e - col(s"__p$l") * lit(gram(priors(l), v))
        }
        val aggCols =
          (1 to dim).map(i =>
            sum(col("__s") * element_at(col("__c"), i)).as(s"__a$i")) ++
            priors.indices.map(l =>
              sum(col("__s") * col(s"__p$l")).as(s"__b$l"))
        val row = withP.withColumn("__s", s)
          .agg(aggCols.head, aggCols.tail: _*).collect()(0)
        def cell(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
        val b = priors.indices.map(l => cell(dim + l))
        val w = (0 until dim).map { i =>
          val a = cell(i)
          roundTo(priors.indices.foldLeft(a)((e, l) =>
            e - priors(l)(i) * b(l)), wDecimals)
        }.toArray
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = if (norm == 0.0) Array.fill(dim)(0.0)
            else w.map(x => roundTo(x / norm, vDecimals))
      }
      components :+= v
    }
    (m, components)
    }
  }

  /** Per-row PCA reconstruction error `(idCol, err)`: the squared norm
    * of the residual AFTER removing all `k` fitted components — what
    * the low-rank model could NOT explain. The complement of
    * [[centroidDistances]]' outlier signal: a row can sit near its
    * cluster centroid yet be structurally unlike the corpus (high
    * residual), and vice versa.
    *
    * Computed ALGEBRAICALLY, not by materializing the residual chain:
    * with s_j the j-th residual's projection,
    *   s_j  = (c·v_j) − Σ_{l<j} s_l (v_l·v_j)
    *   err  = ‖c‖² − Σ_j s_j² (2 − ‖v_j‖²)
    * (exact: ‖r − s v‖² = ‖r‖² − s²(2 − ‖v‖²) because r·v = s by
    * definition; the Gram terms correct for the rounded components not
    * being exactly orthonormal). The per-row cost is k flat dot
    * products over the centered vector + scalar algebra — the nested
    * residual-expression form re-evaluated inner dot products PER
    * ELEMENT through the HOF lambdas and blew both codegen size and
    * runtime (measured 47→158 s across SFs before the rewrite; ~1 s
    * after). Float order differs from the oracle's explicit residual
    * lists by ~1 ulp; the 6-decimal rounding both sides publish
    * absorbs it (the same margin every rounded-iteration gate rides). */
  def pcaReconstructionError(df: DataFrame, idCol: String, vecCol: String,
                             k: Int, iters: Int = 8,
                             errDecimals: Int = 6): DataFrame = {
    val (m, vs) = pcaFitK(df, vecCol, k, iters)
    if (m.isEmpty)
      return df.select(col(idCol), lit(0.0).as("err")).limit(0)
    val centered = zip_with(col(vecCol), typedlit(m.toSeq),
      (a, b) => a.cast(DoubleType) - b)
    val r0sq = aggregate(transform(centered, e => e * e),
      lit(0.0), (acc, p) => acc + p)
    def dot0(v: Array[Double]): Column = aggregate(
      zip_with(centered, typedlit(v.toSeq), (a, b) => a * b),
      lit(0.0), (acc, p) => acc + p)
    def gram(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val sCols = vs.indices.foldLeft(Seq.empty[Column]) { (acc, j) =>
      val corrected = acc.zipWithIndex.foldLeft(dot0(vs(j))) {
        case (e, (sl, l)) => e - sl * lit(gram(vs(l), vs(j)))
      }
      acc :+ corrected
    }
    val err = vs.indices.foldLeft(r0sq) { (e, j) =>
      e - sCols(j) * sCols(j) * lit(2.0 - gram(vs(j), vs(j)))
    }
    df.select(col(idCol), round(err, errDecimals).as("err"))
  }

  /** Per-row scores `(idCol, pc1 … pck)` where pc_j is the j-th
    * RESIDUAL's projection onto v_j — the exact quantity the deflated
    * fit iterated on (for orthogonal components this coincides with
    * the plain centered projection; after rounding it is the
    * deterministic choice both engines replay). */
  def pcaProjectK(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int = 8,
                  scoreDecimals: Int = 6): DataFrame = {
    val (m, vs) = pcaFitK(df, vecCol, k, iters)
    if (m.isEmpty) {
      val empty = (1 to k).map(j => lit(0.0).as(s"pc$j"))
      return df.select(col(idCol) +: empty: _*).limit(0)
    }
    val centered = zip_with(col(vecCol), typedlit(m.toSeq),
      (a, b) => a.cast(DoubleType) - b)
    def dot0(v: Array[Double]): Column = aggregate(
      zip_with(centered, typedlit(v.toSeq), (a, b) => a * b),
      lit(0.0), (acc, p) => acc + p)
    def gram(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // flat Gram-corrected residual projections (see pcaFitK's scaladoc
    // note on why the explicit residual chain is avoided)
    val sCols = vs.indices.foldLeft(Seq.empty[Column]) { (acc, j) =>
      acc :+ acc.zipWithIndex.foldLeft(dot0(vs(j))) {
        case (e, (sl, l)) => e - sl * lit(gram(vs(l), vs(j)))
      }
    }
    val scores = vs.indices.map(j =>
      round(sCols(j), scoreDecimals).as(s"pc${j + 1}"))
    df.select(col(idCol) +: scores: _*)
  }
}

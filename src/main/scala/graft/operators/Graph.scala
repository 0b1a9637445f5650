package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the iterative
  * complement of [[Dedup.connectedComponents]] (which already covers the
  * clustering half). No vertex ever materializes on the driver; every
  * iteration is one equi-join + one aggregation, both keyed on vertex
  * ids, so each step is a bounded pair of hash shuffles at any graph
  * size.
  */
object Graph {

  /** Fixed-iteration PageRank (damped). By default the classic
    * simplified variant: mass from dangling vertices — out-degree 0 — is
    * DROPPED rather than redistributed, so feed symmetric edges if every
    * vertex should keep out-links. With `redistributeDangling` the
    * textbook formulation: each round the danglers' aggregate rank is
    * added back uniformly (`damping · danglingMass / n` to every
    * vertex), so total mass stays exactly 1 on any graph. The default
    * stays the dropped-mass mode for oracle stability (g1's DuckDB
    * recursion replays it). Deterministic for a fixed edge set and
    * iteration count; callers compare ranks only after rounding, because
    * per-vertex contribution sums are floating-point and
    * partial-aggregation order is engine- and run-dependent (~1e-13
    * relative over tens of iterations — round at 1e-8 and the noise is
    * five orders below the step).
    *
    * Scale shape per iteration: edges ⋈ ranks on src (hash join),
    * groupBy dst (partial+final aggregate), left join back to the vertex
    * set — no global ordering anywhere. Lineage is truncated with
    * localCheckpoint every `checkpointEvery` rounds (same caveat as
    * Dedup.truncate: a durable deployment points at a reliable
    * checkpoint dir instead). Driver values: the vertex count, plus —
    * redistributing only — one dangling-mass scalar per round (a 1-row
    * anti-join aggregate); that mode also checkpoints EVERY round, since
    * the scalar materializes the round anyway and re-deriving an
    * unmaterialized prefix once per round would turn the window
    * quadratic. Returns (id, rank). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iterations: Int = 10,
               checkpointEvery: Int = 5,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 0 && checkpointEvery > 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint(eager = true) // edge derivation runs once, not per round
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val base =
        if (!redistributeDangling) (1.0 - damping) / n
        else {
          ranks = ranks.localCheckpoint(eager = true)
          val dangling = ranks
            .join(outdeg.select(col("src").as("id")), Seq("id"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)))
            .head().getDouble(0)
          (1.0 - damping) / n + damping * dangling / n
        }
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base)
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (!redistributeDangling && i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(eager = true)
    }
    ranks
  }

  /** Per-vertex triangle counts by DEGREE-ORIENTED wedge enumeration —
    * the scale-grade algorithm, not the naive one: every undirected edge
    * is oriented from its lower-(degree, id) endpoint to the higher, so
    * wedges are enumerated only at each vertex's out-neighbors and the
    * wedge volume is Σ outdeg² = O(|E|^1.5) even on skewed graphs (the
    * naive u<v self-join pays Σ deg² — quadratic in the hub degree).
    * Each triangle is found exactly once (its lowest-ordered vertex owns
    * it). Input edges are treated as undirected; self-loops and
    * duplicates are dropped. Returns (id, n_triangles) covering every
    * vertex, zeros included.
    *
    * Scale shape: a degree aggregate, two hash joins to orient, one
    * wedge self-join keyed on the wedge apex, one closing equi-join on
    * the (dst, dst) pair, one explode+aggregate for per-vertex counts —
    * all equi-keyed, no cartesian stage. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v")).distinct()
      // the edge set feeds the vertex/degree aggregates and all three
      // sides of the wedge join: materialize the (possibly expensive)
      // derivation once instead of once per consumer
      .localCheckpoint(eager = true)
    val verts = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient: src = lower (deg, id) endpoint; keep the dst's (deg, id)
    // rank key so wedge enumeration can order the two out-neighbors
    val ud = e.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val o = ud.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
    val wedges = o.as("e1").join(o.as("e2"),
      col("e1.src") === col("e2.src") &&
        (col("e1.ddeg") < col("e2.ddeg") ||
          (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("ta"), col("e1.dst").as("tb"), col("e2.dst").as("tc"))
    val tri = wedges.join(o.as("e3"),
      col("tb") === col("e3.src") && col("tc") === col("e3.dst"))
      .select("ta", "tb", "tc")
    val perVertex = tri
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    verts.join(perVertex, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** SYNCHRONOUS label propagation (community detection): every vertex
    * starts labeled with its own id; each round it adopts the most
    * frequent label among its in-neighbors, ties to the smallest label.
    * The classic asynchronous variant is visit-order-dependent — useless
    * in a reproducible pipeline — so this is the Jacobi-style sweep: a
    * fixed iteration count over a fixed edge set is deterministic
    * arithmetic in any engine. Vertices with no in-edges keep their
    * label (feed symmetric edges for the undirected semantics).
    *
    * Scale shape per round: edges ⋈ labels (hash join on vertex id), a
    * (vertex, label) count aggregate, then the argmax as ONE struct-min
    * aggregate keyed on the vertex — no window, no global order, the
    * per-round state is exactly one row per vertex. Lineage truncated
    * with localCheckpoint every `checkpointEvery` rounds (g1's caveat:
    * durable deployments should checkpoint to reliable storage).
    * Returns (id, label). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int = 4, checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 0 && checkpointEvery > 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = true)
    var labels = nodes.withColumn("label", col("id"))
    for (i <- 1 to iterations) {
      val counts = e
        .join(labels.select(col("id").as("src"), col("label").as("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) as a struct-min: one aggregate,
      // deterministic under any partial-aggregation order
      val next = counts
        .groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("next_label"))
      labels = labels.join(next, Seq("id"), "left")
        .select(col("id"), coalesce(col("next_label"), col("label")).as("label"))
      if (i % checkpointEvery == 0 && i < iterations)
        labels = labels.localCheckpoint(eager = true)
    }
    labels
  }

  /** Multi-source BFS: hop distance from the nearest seed, bounded at
    * `maxHops` rounds (vertices not reached within the bound keep a null
    * distance — the caller chose the horizon, the operator reports it
    * honestly). The influence-radius / contamination-blast-radius
    * primitive. Deterministic: distance is a pure min, no tie-breaks
    * needed.
    *
    * Scale shape per round: frontier ⋈ edges (hash join on vertex id),
    * a min aggregate keyed on the destination, one left join back — the
    * same bounded per-round budget as [[pageRank]]; lineage truncated
    * every `checkpointEvery` rounds. Returns (id, hops: int|null). */
  def shortestHops(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String, maxHops: Int = 4,
                   checkpointEvery: Int = 5): DataFrame = {
    require(maxHops >= 0 && checkpointEvery > 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = true)
    val s = seeds.select(col(seedCol).as("id")).distinct()
    var dist = nodes.join(s.withColumn("__seed", lit(true)), Seq("id"), "left")
      .select(col("id"), when(col("__seed"), lit(0)).as("hops"))
    for (i <- 1 to maxHops) {
      val relaxed = e
        .join(dist.select(col("id").as("src"), col("hops").as("sh")), "src")
        .where(col("sh").isNotNull)
        .groupBy(col("dst").as("id"))
        .agg((min(col("sh")) + 1).as("nd"))
      dist = dist.join(relaxed, Seq("id"), "left")
        .select(col("id"),
          when(col("hops").isNull, col("nd"))
            .when(col("nd").isNull, col("hops"))
            .otherwise(least(col("hops"), col("nd"))).as("hops"))
      if (i % checkpointEvery == 0 && i < maxHops)
        dist = dist.localCheckpoint(eager = true)
    }
    dist.select(col("id"), col("hops").cast("int").as("hops"))
  }
}

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

  /** Fixed-iteration PageRank (damped, the classic simplified variant:
    * mass from dangling vertices — out-degree 0 — is dropped rather than
    * redistributed, so feed symmetric edges if every vertex should keep
    * out-links). Deterministic for a fixed edge set and iteration count;
    * callers compare ranks only after rounding, because per-vertex
    * contribution sums are floating-point and partial-aggregation order
    * is engine- and run-dependent (~1e-13 relative over tens of
    * iterations — round at 1e-8 and the noise is five orders below the
    * step).
    *
    * Scale shape per iteration: edges ⋈ ranks on src (hash join),
    * groupBy dst (partial+final aggregate), left join back to the vertex
    * set — no global ordering anywhere. Lineage is truncated with
    * localCheckpoint every `checkpointEvery` rounds (same caveat as
    * Dedup.truncate: a durable deployment points at a reliable
    * checkpoint dir instead). The only driver value is the vertex count
    * (one scalar). Returns (id, rank). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iterations: Int = 10,
               checkpointEvery: Int = 5): DataFrame = {
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
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(eager = true)
    }
    ranks
  }
}

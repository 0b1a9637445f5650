package graft.queries

import org.apache.spark.sql.functions._
import graft.Lake
import graft.operators.Graph

/** Graph-analytics inventory (SURVEY.md §2b): iterative vertex programs
  * over edge DataFrames. Clustering (connected components) lives with the
  * dedup operators; this module holds the ranking side. The oracle
  * unrolls the same fixed iteration count as chained CTEs — PageRank with
  * a fixed edge set and iteration count is deterministic arithmetic, so
  * the two engines agree to ~1e-13 and compare exactly after the 1e-8
  * round.
  */
object GraphQueries {

  val defs: Map[String, Q] = Map(

    // ---- damped PageRank over the supplier↔customer ship graph ---------
    // Edges: supplier s shipped a line item on an order customer c placed
    // (both directions, so no vertex dangles and rank mass is conserved).
    // 5 iterations, damping 0.85. Each iteration is one hash join + one
    // aggregate keyed on vertex ids — no global ordering, no driver
    // state beyond the vertex count scalar.
    "g1_pagerank" -> Q(
      (s, dir) => {
        val lake = Lake(s, dir)
        val base = lake.lineitem
          .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("s"), col("l_suppkey")).as("sup"),
            concat(lit("c"), col("o_custkey")).as("cust"))
        val edges = base.select(col("sup").as("src"), col("cust").as("dst"))
          .unionByName(base.select(col("cust").as("src"), col("sup").as("dst")))
        Graph.pageRank(edges, "src", "dst", damping = 0.85, iterations = 5)
          .select(col("id"), round(col("rank"), 8).as("rank"))
          .orderBy("id")
      },
      Some(
        """WITH base AS (
          |  SELECT 's' || l_suppkey::VARCHAR AS sup, 'c' || o_custkey::VARCHAR AS cust
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS (SELECT sup AS src, cust AS dst FROM base
          |      UNION SELECT cust, sup FROM base),
          |nodes AS (SELECT DISTINCT src AS id FROM e),
          |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
          |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
          |       FROM e GROUP BY src),
          |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
          |r1 AS (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r0 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r2 AS (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r1 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r3 AS (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r2 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r4 AS (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r3 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r5 AS (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r4 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id)
          |SELECT id, round(r, 8) AS rank FROM r5 ORDER BY id""".stripMargin))
  )
}

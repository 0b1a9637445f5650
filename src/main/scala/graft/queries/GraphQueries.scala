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
        """WITH base AS MATERIALIZED (
          |  SELECT 's' || l_suppkey::VARCHAR AS sup, 'c' || o_custkey::VARCHAR AS cust
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS MATERIALIZED (SELECT sup AS src, cust AS dst FROM base
          |      UNION SELECT cust, sup FROM base),
          |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
          |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
          |od AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
          |       FROM e GROUP BY src),
          |r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
          |r1 AS MATERIALIZED (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r0 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r2 AS MATERIALIZED (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r1 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r3 AS MATERIALIZED (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r2 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r4 AS MATERIALIZED (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r3 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id),
          |r5 AS MATERIALIZED (SELECT nodes.id,
          |         (SELECT (1 - 0.85) / n FROM nn) + 0.85 * COALESCE(x.sm, 0.0) AS r
          |       FROM nodes LEFT JOIN (
          |         SELECT e.dst AS id, sum(p.r / od.outdeg) AS sm
          |         FROM e JOIN r4 p ON p.id = e.src JOIN od ON od.src = e.src
          |         GROUP BY e.dst) x ON x.id = nodes.id)
          |SELECT id, round(r, 8) AS rank FROM r5 ORDER BY id""".stripMargin)),

    // ---- per-vertex triangle counts on the near-dup graph --------------
    // Triangles measure the transitivity of the near-duplicate relation
    // (the diagnostic for whether a pairwise threshold yields coherent
    // clusters). Edges are the exact-Jaccard d3 rule (3-shingles,
    // j >= 0.8); counting is degree-oriented (Σ outdeg² = O(E^1.5), not
    // the hub-quadratic naive join). The oracle enumerates the same
    // triangle set from the canonical u<v edge list — orientation
    // changes the join cost, never the triangle set.
    "g2_triangles" -> Q(
      (s, dir) => {
        val pairs = graft.operators.Dedup.jaccardPairs(
          Lake(s, dir).documents, "doc_id", "text",
          shingleN = 3, threshold = 0.8)
        Graph.triangleCounts(pairs, "id_a", "id_b").orderBy("id")
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
          |-- the engine's maxShingleDf=1000 skew guard, mirrored (see d3);
          |-- sh/shg are multi-referenced, so they MATERIALIZE (DuckDB
          |-- inlines CTEs: concurrent re-expansions of the posting unnest
          |-- spilled past the 30GB temp cap at sf1)
          |), hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
          |), shg AS MATERIALIZED (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
          |cand AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |e AS (
          |  SELECT id_a AS u, id_b AS v FROM cand
          |  JOIN cnt ca ON ca.doc_id = id_a
          |  JOIN cnt cb ON cb.doc_id = id_b
          |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8),
          |verts AS (SELECT u AS id FROM e UNION SELECT v FROM e),
          |tri AS (
          |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
          |  FROM e e1 JOIN e e2 ON e2.u = e1.v
          |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
          |pv AS (SELECT x AS id, count(*) AS n
          |       FROM (SELECT unnest([a, b, c]) AS x FROM tri) GROUP BY 1)
          |SELECT v.id, CAST(COALESCE(pv.n, 0) AS BIGINT) AS n_triangles
          |FROM verts v LEFT JOIN pv USING (id)
          |ORDER BY v.id""".stripMargin)),

    // ---- synchronous label propagation (community detection) -----------
    // Four Jacobi-style sweeps over the same supplier↔customer ship
    // graph as g1: adopt the modal in-neighbor label, ties to the
    // smallest. Fixed rounds + deterministic tie-break = identical
    // labels in any engine; the oracle unrolls the four rounds with a
    // per-vertex (count DESC, label ASC) row_number argmax, which equals
    // the engine's struct-min aggregate by construction.
    "g3_label_propagation" -> Q(
      (s, dir) => {
        val lake = Lake(s, dir)
        val base = lake.lineitem
          .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("s"), col("l_suppkey")).as("sup"),
            concat(lit("c"), col("o_custkey")).as("cust"))
        val edges = base.select(col("sup").as("src"), col("cust").as("dst"))
          .unionByName(base.select(col("cust").as("src"), col("sup").as("dst")))
        Graph.labelPropagation(edges, "src", "dst", iterations = 4)
          .orderBy("id")
      },
      // Every CTE is MATERIALIZED: l$i references l${i-1} TWICE (argmax
      // source + tie-break fallback), so DuckDB's default CTE inlining
      // re-expands the whole chain 2^rounds times — at sf1 (12M string
      // edges) that spilled >70 GB of temp and OOMed; materialized, the
      // same query runs in ~18 s. Semantics are unchanged (pure hint).
      Some {
        val head =
          """WITH base AS MATERIALIZED (
            |  SELECT 's' || l_suppkey::VARCHAR AS sup, 'c' || o_custkey::VARCHAR AS cust
            |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            |e AS MATERIALIZED (SELECT sup AS src, cust AS dst FROM base
            |      UNION SELECT cust, sup FROM base),
            |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
            |l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)""".stripMargin
        val rounds = (1 to 4).map { i =>
          s"""c$i AS MATERIALIZED (SELECT e.dst AS id, l.label AS lbl, count(*) AS c
             |      FROM e JOIN l${i - 1} l ON l.id = e.src GROUP BY 1, 2),
             |l$i AS MATERIALIZED (SELECT n.id, COALESCE(x.lbl, p.label) AS label
             |      FROM nodes n
             |      LEFT JOIN (SELECT id, lbl FROM (
             |          SELECT id, lbl,
             |            ROW_NUMBER() OVER (PARTITION BY id
             |              ORDER BY c DESC, lbl) AS rn
             |          FROM c$i) WHERE rn = 1) x ON x.id = n.id
             |      JOIN l${i - 1} p ON p.id = n.id)""".stripMargin
        }.mkString(",\n", ",\n", "")
        head + rounds + "\nSELECT id, label FROM l4 ORDER BY id"
      }),

    // ---- multi-source BFS hop distance ---------------------------------
    // Blast-radius analysis on the ship graph: hop distance from the
    // nation-0 supplier fleet, bounded at 4 hops (unreached = null —
    // the horizon is the caller's, the report is honest). Distance is a
    // pure min — deterministic with no tie-break machinery; the oracle
    // unrolls the same four relaxation rounds.
    "g4_shortest_hops" -> Q(
      (s, dir) => {
        val lake = Lake(s, dir)
        val base = lake.lineitem
          .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("s"), col("l_suppkey")).as("sup"),
            concat(lit("c"), col("o_custkey")).as("cust"))
        val edges = base.select(col("sup").as("src"), col("cust").as("dst"))
          .unionByName(base.select(col("cust").as("src"), col("sup").as("dst")))
        val seeds = lake.supplier.where(col("s_nationkey") === 0)
          .select(concat(lit("s"), col("s_suppkey")).as("seed"))
        Graph.shortestHops(edges, "src", "dst", seeds, "seed", maxHops = 4)
          .orderBy("id")
      },
      // MATERIALIZED for the same reason as g3: d$i references d${i-1}
      // twice (relaxation source + carry-forward), so inlining is
      // exponential in rounds; materialized, sf1 runs in ~6 s.
      Some {
        val head =
          """WITH base AS MATERIALIZED (
            |  SELECT 's' || l_suppkey::VARCHAR AS sup, 'c' || o_custkey::VARCHAR AS cust
            |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            |e AS MATERIALIZED (SELECT sup AS src, cust AS dst FROM base
            |      UNION SELECT cust, sup FROM base),
            |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
            |d0 AS MATERIALIZED (SELECT id, CASE WHEN id IN (
            |         SELECT 's' || s_suppkey::VARCHAR FROM supplier
            |         WHERE s_nationkey = 0) THEN 0 END AS hops
            |       FROM nodes)""".stripMargin
        val rounds = (1 to 4).map { i =>
          s"""d$i AS MATERIALIZED (SELECT n.id,
             |        CASE WHEN n.hops IS NULL THEN x.nd
             |             WHEN x.nd IS NULL THEN n.hops
             |             ELSE least(n.hops, x.nd) END AS hops
             |      FROM d${i - 1} n LEFT JOIN (
             |        SELECT e.dst AS id, min(p.hops) + 1 AS nd
             |        FROM e JOIN d${i - 1} p ON p.id = e.src
             |        WHERE p.hops IS NOT NULL
             |        GROUP BY e.dst) x ON x.id = n.id)""".stripMargin
        }.mkString(",\n", ",\n", "")
        head + rounds + "\nSELECT id, CAST(hops AS INTEGER) AS hops FROM d4 ORDER BY id"
      })
  )
}

package graft.tools

import graft.{GraftSession, SparkEntry}

/** Automated plan-hygiene gate: walks every declared query's physical
  * plan and fails (exit 1) on an UNEXPECTED nested-loop or cartesian
  * join — the two shapes that silently turn a pipeline quadratic at
  * scale. A small allowlist names the queries whose nested-loop joins
  * are the DESIGNED broadcast patterns:
  *
  *  - s1/s4/q24: a small broadcast query set scored against the corpus
  *    scan (brute-force top-k — the right plan when |queries| is tiny);
  *  - t12/t16/t17: a 1-row scalar aggregate (corpus total / sketch)
  *    broadcast-crossed into a per-row computation.
  *
  * Everything else must plan as hash/sort-merge joins. Run after adding
  * a query: `runMain graft.tools.PlanAudit [sfDir]`.
  */
object PlanAudit {

  private val allowedNestedLoop = Set(
    "s1_cosine_topk", "s4_ann_ivf", "q24_sql_cosine",
    "t12_tfidf", "t16_rare_tokens", "t17_countmin")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-plan-audit")
    spark.sparkContext.setLogLevel("WARN")
    var bad = List.empty[String]
    SparkEntry.all.keys.toSeq.sorted.foreach { n =>
      val plan = SparkEntry.all(n).fn(spark, sfDir)
        .queryExecution.executedPlan.toString
      val nested = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (nested && !allowedNestedLoop(n)) bad ::= n
      val verdict =
        if (!nested) "ok"
        else if (allowedNestedLoop(n)) "ok (allowlisted broadcast pattern)"
        else "UNEXPECTED nested-loop/cartesian join"
      println(f"[audit] $n%-28s $verdict")
    }
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[audit] FAILED: ${bad.sorted.mkString(", ")}")
      sys.exit(1)
    }
    println(s"[audit] PASS: ${SparkEntry.all.size} plans, 0 unexpected joins")
  }
}

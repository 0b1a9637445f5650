package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.{Similarity, VectorIndex}

/** The persisted-IVF-index contract: serving from disk equals the inline
  * train-and-query path, and the probed read is partition-pruned to the
  * probed buckets (the nProbe/2^planes byte-cost claim s14 rides on). */
class VectorIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Lake(spark, sf0001).embeddings
  private lazy val corpus = emb.where(col("vec_id") >= 10)
  private lazy val queries = emb.where(col("vec_id") < 10)
  private lazy val dir = {
    val p = "/root/repo/target/ivf_stage/vector_index_spec"
    VectorIndex.build(corpus, p, "vec_id", "embedding", planes = 4)
    p
  }

  test("served top-k equals the inline ivfTopK at the same parameters") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val served = canon(VectorIndex.query(spark, dir, queries,
      "vec_id", "embedding", k = 5, nProbe = 3))
    val inline = canon(Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", k = 5, planes = 4, nProbe = 3))
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("index layout: cells are bucket-partitioned, centroids bounded by 2^planes") {
    val buckets = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(buckets.length > 1, s"expected bucket partitions, got ${buckets.toSeq}")
    assert(spark.read.parquet(s"$dir/centroids").count() <= 16)
  }

  test("probe scan is dynamically partition-pruned to the probed buckets") {
    val df = VectorIndex.query(spark, dir, queries,
      "vec_id", "embedding", k = 5, nProbe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan
    val plan = p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(p).toString
    assert(plan.contains("dynamicpruning"), plan.take(800))
  }

  test("rebuild overwrites in place; a fresh session can query without retraining") {
    val p = "/root/repo/target/ivf_stage/vector_index_spec_rebuild"
    VectorIndex.build(corpus, p, "vec_id", "embedding", planes = 4)
    VectorIndex.build(corpus, p, "vec_id", "embedding", planes = 4)
    val n = VectorIndex.query(spark, p, queries,
      "vec_id", "embedding", k = 3, nProbe = 2).count()
    assert(n > 0)
  }
}

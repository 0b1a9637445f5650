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

  test("append-grown LSH index holds a rebuild's cells; full-probe answers agree") {
    val p1 = "/root/repo/target/ivf_stage/vector_index_spec_append"
    val p2 = "/root/repo/target/ivf_stage/vector_index_spec_full"
    val half1 = corpus.where(col("vec_id") % 2 === 0)
    val half2 = corpus.where(col("vec_id") % 2 === 1)
    VectorIndex.build(half1, p1, "vec_id", "embedding", planes = 4)
    VectorIndex.append(half2, p1, "vec_id", "embedding")
    VectorIndex.build(corpus, p2, "vec_id", "embedding", planes = 4)
    // cell-for-cell: deterministic hash assignment makes the grown index
    // hold exactly the rebuilt index's (id, bucket) set
    def cells(dir: String) = spark.read.parquet(s"$dir/cells")
      .select("neighbor_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(cells(p1) === cells(p2))
    // probing EVERY bucket removes centroid-float probe-order effects:
    // the served answer must then be identical
    def canon(dir: String) =
      VectorIndex.query(spark, dir, queries, "vec_id", "embedding",
          k = 5, nProbe = 16)
        .select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(canon(p1) === canon(p2))
    // refreshed centroids track a rebuild's within float tolerance
    val c1 = spark.read.parquet(s"$p1/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c2 = spark.read.parquet(s"$p2/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c1.keySet === c2.keySet)
    for (b <- c1.keySet; (x, y) <- c1(b).zip(c2(b)))
      assert(math.abs(x - y) < 1e-9, s"bucket $b centroid drifted")
  }

  test("trained-mode append routes new vectors to existing centroids only") {
    val p = "/root/repo/target/ivf_stage/vector_index_spec_trained"
    val half1 = corpus.where(col("vec_id") % 2 === 0)
    val half2 = corpus.where(col("vec_id") % 2 === 1)
    VectorIndex.build(half1, p, "vec_id", "embedding",
      planes = 3, kmeansIters = 2)
    val bucketsBefore = spark.read.parquet(s"$p/cells")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    VectorIndex.append(half2, p, "vec_id", "embedding")
    val after = spark.read.parquet(s"$p/cells")
    val bucketsAfter = after.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(bucketsAfter === bucketsBefore, "append must not invent cells")
    assert(after.count() === corpus.count())
    val served = VectorIndex.query(spark, p, queries,
      "vec_id", "embedding", k = 5, nProbe = 2)
    assert(served.groupBy("query_id").count()
      .where(col("count") =!= 5).count() === 0L)
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

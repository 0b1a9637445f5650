package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorSpec extends AnyFunSuite {
  import TestSpark._

  test("fused cosine expression is bit-identical to the HOF composition") {
    val emb = Lake(spark, sf0001).embeddings.limit(100)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib")).limit(2000)
      .select(
        VectorFunctions.cosine(col("va"), col("vb")).as("fused"),
        VectorFunctions.cosineHof(col("va"), col("vb")).as("hof"))
    val mismatches = pairs.where(col("fused") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("cosine handles nulls and zero vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),   // identical -> 1.0
      (Array(0f, 0f), Array(1f, 0f))    // zero norm -> 0.0, not NaN
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 1.0 && got(1) === 0.0)
    val withNull = df.select(
      VectorFunctions.cosine(lit(null).cast("array<float>"), col("b"))).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("LSH bucketing always retrieves an identical vector (self-recall 1.0)") {
    // Driver embeddings are near-random (max pairwise cosine ~0.5), so
    // general top-k recall at planes=4 is legitimately low (~(1-θ/π)^4).
    // The property that must hold exactly: an identical vector lands in
    // the same bucket every time, so querying with corpus members returns
    // the member itself at rank 1 with sim ~1.
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    val queries = corpus.limit(10)
    val top1 = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 1, planes = 4)
      .where(col("rank") === 1).collect()
    assert(top1.length === 10)
    assert(top1.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    assert(top1.forall(r => math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Parallelism

class ParallelismSpec extends AnyFunSuite {
  import TestSpark._

  test("single small file scans re-parallelize to the cluster width") {
    val docs = Lake(spark, sf0001).documents // one tiny parquet file
    val target = spark.sparkContext.defaultParallelism
    assert(docs.rdd.getNumPartitions < target, "fixture must be under-parallel")
    assert(Parallelism.ensure(docs).rdd.getNumPartitions === target)
    // and the metadata probe agrees with the old RDD probe's decision
    assert(Parallelism.ensure(docs) ne docs)
  }

  test("decision matches the RDD-probe on every driver fixture table") {
    val lake = Lake(spark, sf001)
    val target = spark.sparkContext.defaultParallelism
    for (df <- Seq(lake.documents, lake.embeddings, lake.events,
        lake.lineitem, lake.orders, lake.customer)) {
      val rddSays = df.rdd.getNumPartitions < target
      val metaSays = Parallelism.ensure(df) ne df
      assert(metaSays === rddSays,
        s"probe disagreement (rdd=$rddSays meta=$metaSays)")
    }
  }

  test("spread floors at ONE partition for inputs under one task's work (ADVICE r19)") {
    val docs = Lake(spark, sf0001).documents // one tiny parquet file, ~KBs
    // a work floor far above the input must spread to exactly 1 partition
    // — never 0 (which would collide with the ensure sentinel and fan the
    // tiniest input to every core, the overhead this floor prevents)
    val spreadWide = Parallelism.spread(docs, Long.MaxValue / 4)
    assert(spreadWide.rdd.getNumPartitions === 1)
    // a floor below the input behaves like ensure (capped at the cluster)
    assert(Parallelism.spread(docs, 1L).rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("probe adds no extra job and leaves streaming frames untouched") {
    // streaming: df.rdd would throw AnalysisException; the metadata probe
    // must fall through without touching the frame
    val d = java.nio.file.Files.createTempDirectory("par_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      d.resolve("documents.parquet"))
    val stream = spark.readStream
      .schema(Lake(spark, sf0001).documents.schema)
      .parquet(d.toString)
    assert(Parallelism.ensure(stream) eq stream)
    // non-file source (local relation): also untouched
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(Parallelism.ensure(local) eq local)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Pins the two partition-pruning behaviors the 100 TB layout story
  * rests on: STATIC pruning (a literal partition predicate reaches the
  * scan's PartitionFilters — directories for other partitions are never
  * listed into the read) and DYNAMIC partition pruning (a join against a
  * filtered dimension injects a runtime subquery filter on the fact
  * scan's partition column, so the fact read is pruned by the dim's
  * surviving keys at execution time — Spark's own runtime-filter
  * complement to the explicit `RuntimeFilter` operator). */
class PruningSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val stage = {
    val p = "target/part_stage/pruning_spec"
    Lake(spark, sf0001).orders
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(p)
    p
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize any adaptive plan
    val p = df.queryExecution.executedPlan
    val adaptive = p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
    adaptive.getOrElse(p).toString
  }

  test("static partition pruning: literal predicate lands in PartitionFilters") {
    val df = spark.read.parquet(stage)
      .where(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)))
    val plan = finalPlan(df)
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // the predicate must appear inside PartitionFilters (scan-level,
    // directory pruning), not as a post-scan Filter on the data column
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("1-URGENT"), pf)
  }

  test("parquet footer aggregate pushdown: MIN/MAX/COUNT served from metadata") {
    val conf = spark.conf
    val keys = Seq("spark.sql.parquet.aggregatePushDown",
      "spark.sql.sources.useV1SourceList")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // aggregate pushdown lives in the V2 parquet scan; parquet rides
      // the V1 list by default, so both knobs move together
      conf.set("spark.sql.parquet.aggregatePushDown", "true")
      conf.set("spark.sql.sources.useV1SourceList", "")
      val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min("l_partkey").as("lo"), max("l_partkey").as("hi"))
      val plan = finalPlan(df)
      assert(plan.contains("PushedAggregation"), plan.take(800))
      val pushed = df.head()
      // and the metadata-served numbers must equal the row-scan truth
      conf.set("spark.sql.parquet.aggregatePushDown", "false")
      val noPush = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min("l_partkey").as("lo"), max("l_partkey").as("hi"))
        .head()
      assert(pushed === noPush)
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("dynamic partition pruning: dim filter injects a runtime subquery on the fact scan") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    try {
      // let DPP build its own subquery even without a reusable broadcast
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      val fact = spark.read.parquet(stage)
      val dim = Lake(spark, sf0001).orders
        .select(col("o_orderpriority").as("pri")).distinct()
        .where(col("pri").startsWith("1"))
      val joined = fact.join(dim, fact("o_orderpriority") === dim("pri"))
        .agg(count(lit(1)))
      val plan = finalPlan(joined)
      assert(plan.contains("dynamicpruning"), plan.take(800))
    } finally {
      saved match {
        case Some(v) => conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", v)
        case None => conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
      }
    }
  }
}

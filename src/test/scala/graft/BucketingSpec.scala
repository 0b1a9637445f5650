package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("co-bucketed join plans with no shuffle exchange") {
    val lk = Lake(spark, sf0001)
    Bucketing.writeBucketed(lk.orders, "orders_b", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(
      lk.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", 8, Seq("o_orderkey"))

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "lineitem_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it still computes the right thing
    val n = joined.count()
    val expected = lk.orders.join(lk.lineitem,
      col("o_orderkey") === col("l_orderkey")).count()
    assert(n === expected)
  }

  test("bucketed aggregation on the bucket key avoids the exchange") {
    val agg = Bucketing.table(spark, "lineitem_b")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$plan")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.OrEquiJoinRule

/** The injected optimizer rule: naive OR-left-joins rewritten plan-wide
  * when spark.graft.rewriteOrJoin=true. */
class OrEquiJoinRuleSpec extends AnyFunSuite {
  import TestSpark._

  private def naiveOrJoin() = {
    val lk = Lake(spark, sf0001)
    lk.customer.join(lk.supplier,
      col("c_nationkey") === col("s_nationkey") || col("c_name") === col("s_name"),
      "left")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set(OrEquiJoinRule.ConfKey, on.toString)
    try f finally spark.conf.unset(OrEquiJoinRule.ConfKey)
  }

  test("rule off (default): naive OR join plans a nested-loop join") {
    val plan = naiveOrJoin().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("rule on: same DataFrame code plans hash joins only") {
    withRule(on = true) {
      val plan = naiveOrJoin().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"))
    }
  }

  test("rule on: results are multiset-identical to the nested-loop plan") {
    val expected = canon(naiveOrJoin())
    val got = withRule(on = true) { canon(naiveOrJoin()) }
    assert(got === expected)
  }

  test("rule on: SQL-text OR join is rewritten too") {
    withRule(on = true) {
      Lake(spark, sf0001).registerViews()
      val df = spark.sql(
        """SELECT c_custkey, s_suppkey FROM customer LEFT JOIN supplier
          |ON c_nationkey = s_nationkey OR c_name = s_name""".stripMargin)
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.count() > 0)
    }
  }

  test("rule leaves non-equi OR joins alone") {
    withRule(on = true) {
      val lk = Lake(spark, sf0001)
      val df = lk.customer.join(lk.supplier,
        col("c_nationkey") === col("s_nationkey") ||
          col("c_acctbal") > col("s_acctbal"), "left")
      // inequality disjunct -> not rewritable -> still nested loop
      assert(df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }
}

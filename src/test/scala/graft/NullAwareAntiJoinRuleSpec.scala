package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.NullAwareAntiJoinRule

/** The injected null-aware-anti-join rule: `NOT IN (subquery)` over
  * nullable keys rewritten to flags + hash existence joins when
  * spark.graft.rewriteNotIn=true. Laws compare rule-on vs rule-off
  * (stock's nested-loop null-aware anti join) on fixtures that exercise
  * every 3VL corner: null left keys, null subquery keys (single and
  * joint), empty subqueries, duplicate rows. */
class NullAwareAntiJoinRuleSpec extends AnyFunSuite {
  import TestSpark._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def withRule[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.getOption(NullAwareAntiJoinRule.ConfKey)
    spark.conf.set(NullAwareAntiJoinRule.ConfKey, on.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set(NullAwareAntiJoinRule.ConfKey, v)
      case None    => spark.conf.unset(NullAwareAntiJoinRule.ConfKey)
    }
  }

  /** The stock NAAJ shows as a nested-loop (or single-col broadcast
    * null-aware) anti join; the rewrite must leave NO LeftAnti nested
    * loop. The rewrite's own 1-row flag cross IS a BNLJ — assert on the
    * anti-join shape, not BNLJ presence. */
  private def hasNestedAnti(df: org.apache.spark.sql.DataFrame): Boolean =
    "BroadcastNestedLoopJoin[^\n]*LeftAnti".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined

  private def mkViews(): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    def maybe[T](v: T): Option[T] = if (rnd.nextInt(4) == 0) None else Some(v)
    val base = Seq.fill(40)((
      maybe(rnd.nextInt(6).toLong), maybe(s"g${rnd.nextInt(6)}"), rnd.nextInt(100)))
    (base ++ base.take(12))  // duplicate left rows keep multiplicity honest
      .toDF("k1", "k2", "v").createOrReplaceTempView("naaj_l")
    Seq.fill(30)((maybe(rnd.nextInt(6).toLong), maybe(s"g${rnd.nextInt(6)}")))
      .toDF("r1", "r2").createOrReplaceTempView("naaj_r")
    // no joint-null rows, single-column nulls only on r2
    Seq.fill(30)((Some(rnd.nextInt(6).toLong): Option[Long],
        maybe(s"g${rnd.nextInt(6)}")))
      .toDF("r1", "r2").createOrReplaceTempView("naaj_r_nn1")
    spark.sql("SELECT r1, r2 FROM naaj_r WHERE FALSE")
      .createOrReplaceTempView("naaj_empty")
  }

  test("2-col NOT IN law: nulls everywhere, vs the stock nested-loop plan") {
    mkViews()
    for (rv <- Seq("naaj_r", "naaj_r_nn1", "naaj_empty")) {
      val q = s"SELECT k1, k2, v FROM naaj_l WHERE (k1, k2) NOT IN " +
        s"(SELECT r1, r2 FROM $rv)"
      val expected = withRule(on = false) {
        val df = spark.sql(q)
        assert(hasNestedAnti(df), s"stock must nest on $rv")
        canon(df)
      }
      withRule(on = true) {
        val df = spark.sql(q)
        assert(!hasNestedAnti(df), s"rewrite must fire on $rv")
        assert(canon(df) === expected, s"diverged on $rv")
      }
    }
  }

  test("1-col NOT IN law: nullable key, hash plan replaces the null-aware join") {
    mkViews()
    val q = "SELECT k1, v FROM naaj_l WHERE k1 NOT IN (SELECT r1 FROM naaj_r)"
    val expected = withRule(on = false) { canon(spark.sql(q)) }
    withRule(on = true) {
      val df = spark.sql(q)
      assert(!hasNestedAnti(df))
      // the exclusion check must be a hash existence join, not any
      // broadcast null-aware special case
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ExistenceJoin") || plan.contains("existence"),
        plan)
      assert(canon(df) === expected)
    }
  }

  test("NOT IN under extra conjuncts: rest of the filter survives") {
    mkViews()
    val q = "SELECT k1, k2, v FROM naaj_l WHERE v >= 10 AND (k1, k2) NOT IN " +
      "(SELECT r1, r2 FROM naaj_r) AND v < 90"
    val expected = withRule(on = false) { canon(spark.sql(q)) }
    withRule(on = true) {
      val df = spark.sql(q)
      assert(!hasNestedAnti(df))
      assert(canon(df) === expected)
    }
  }

  test("all-non-nullable keys: one plain hash anti join (stock still nests!)") {
    import spark.implicits._
    // primitive columns only: a String column from toDF is NULLABLE and
    // would arm the general flags+existence form
    Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k1", "k2").createOrReplaceTempView("naaj_nn_l")
    Seq((1L, 10L), (9L, 90L))
      .toDF("r1", "r2").createOrReplaceTempView("naaj_nn_r")
    val q = "SELECT k1 FROM naaj_nn_l WHERE (k1, k2) NOT IN " +
      "(SELECT r1, r2 FROM naaj_nn_r)"
    withRule(on = false) {
      // the motivating defect: stock's per-column ISNULL arms are built
      // after the last NullPropagation pass, so even a non-nullable
      // schema gets the nested loop
      assert(hasNestedAnti(spark.sql(q)))
    }
    withRule(on = true) {
      val df = spark.sql(q)
      val plan = df.queryExecution.executedPlan.toString
      // NOT IN ≡ NOT EXISTS here: a single hash anti join, none of the
      // flags+existence machinery
      assert(!plan.contains("__naaj"), plan)
      assert(!hasNestedAnti(df), plan)
      assert(canon(df) === Seq("[2]", "[3]"))
    }
  }

  test("stand-down: 3-column NOT IN keeps the stock plan (documented scope)") {
    mkViews()
    val q = "SELECT k1, k2, v FROM naaj_l WHERE (k1, k2, v + 0) NOT IN " +
      "(SELECT r1, r2, 1 FROM naaj_r)"
    val expected = withRule(on = false) { canon(spark.sql(q)) }
    withRule(on = true) {
      val df = spark.sql(q)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__naaj"))
      assert(canon(df) === expected)
    }
  }

  test("stand-down: correlated NOT IN stays with stock decorrelation") {
    mkViews()
    val q = "SELECT k1, k2, v FROM naaj_l l WHERE (k1, k2) NOT IN " +
      "(SELECT r1, r2 FROM naaj_r WHERE r1 IS NULL OR r1 < l.v)"
    val expected = withRule(on = false) { canon(spark.sql(q)) }
    withRule(on = true) {
      val df = spark.sql(q)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__naaj"))
      assert(canon(df) === expected)
    }
  }

  test("GraftSession default: the rule is ARMED") {
    assert(spark.conf.get(NullAwareAntiJoinRule.ConfKey) === "true")
  }
}

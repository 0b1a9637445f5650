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
    // GraftSession arms the rule by default; restore the prior value,
    // not unset (unset would drop to the conf's hard default, false,
    // silently disarming the shared session for later suites)
    val prev = spark.conf.getOption(OrEquiJoinRule.ConfKey)
    spark.conf.set(OrEquiJoinRule.ConfKey, on.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set(OrEquiJoinRule.ConfKey, v)
      case None    => spark.conf.unset(OrEquiJoinRule.ConfKey)
    }
  }

  test("GraftSession default: the rule is ARMED (round-16 decision)") {
    assert(spark.conf.get(OrEquiJoinRule.ConfKey) === "true")
    // and the session default therefore rewrites a naive OR join
    val plan = naiveOrJoin().queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("rule disarmed: naive OR join plans a nested-loop join") {
    withRule(on = false) {
      val plan = naiveOrJoin().queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("rule on: same DataFrame code plans hash joins only") {
    withRule(on = true) {
      val plan = naiveOrJoin().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"))
    }
  }

  test("rule on: results are multiset-identical to the nested-loop plan") {
    val expected = withRule(on = false) { canon(naiveOrJoin()) }
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

  // ---- Aggregate-over-OR-join: the q81 eager-aggregation plan, reached
  // automatically by the rule (no explicit OrEquiJoin.leftOrJoinAgg call).

  private def naiveAgg() = naiveOrJoin()
    .groupBy("c_custkey")
    .agg(count(col("s_suppkey")).as("n_match"),
      min(col("s_name")).as("first_sup"),
      max(col("s_name")).as("last_sup"),
      sum(col("s_acctbal")).as("bal"))

  test("agg rule: results are identical to the nested-loop agg plan") {
    val expected = withRule(on = false) { canon(naiveAgg()) }
    val got = withRule(on = true) { canon(naiveAgg()) }
    assert(got === expected)
  }

  test("agg rule: no pair-materializing join remains — no BNLJ, no Union") {
    withRule(on = true) {
      val plan = naiveAgg().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // a Union in the plan means the bare-join rewrite fired and the
      // aggregate still consumes the materialized pair multiset; the
      // eager plan aggregates per branch and merges by join instead
      assert(!plan.contains("Union"), plan)
    }
  }

  test("agg rule: SQL-text agg-over-OR-join is rewritten too") {
    withRule(on = true) {
      Lake(spark, sf0001).registerViews()
      val df = spark.sql(
        """SELECT c_custkey, COUNT(s_suppkey) AS n_match, MIN(s_name) AS first_sup
          |FROM customer LEFT JOIN supplier
          |  ON c_nationkey = s_nationkey OR c_name = s_name
          |GROUP BY c_custkey""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      val expected = withRule(on = false) { canon(naiveAgg().select("c_custkey", "n_match", "first_sup")) }
      assert(canon(df) === expected)
    }
  }

  test("agg rule law: null keys, null groups, unmatched lefts, dup groups") {
    import spark.implicits._
    // the OrEquiJoinSpec awkward-corner fixture, driven through the RULE
    // path: a null group key, null join keys on either predicate, a left
    // row matching both predicates, a left row matching nothing, and
    // duplicate group keys
    val left = Seq(
      (Some(1L), Some(5L), Some("a")),
      (Some(1L), Some(6L), None),
      (Some(2L), None, Some("b")),
      (None, Some(5L), Some("zz")),
      (Some(3L), None, None),
      (Some(4L), Some(9L), Some("b"))
    ).toDF("g", "k1", "k2")
    val right = Seq(
      (Some(5L), Some("x"), Some(100L)),
      (Some(5L), Some("y"), None),
      (Some(6L), Some("a"), Some(300L)),
      (None, Some("b"), Some(400L))
    ).toDF("r1", "r2", "v")
    def q() = left.join(right,
        col("k1") === col("r1") || col("k2") === col("r2"), "left")
      .groupBy("g")
      .agg(count(col("v")).as("n"), min(col("r2")).as("m"),
        max(col("r2")).as("mx"), sum(col("v")).as("s"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(canon(df) === expected)
    }
  }

  test("agg rule survives a decorating select/orderBy (CollapseProject folds literals in)") {
    // the r15 q82 bug: a parent select adding a literal column collapses
    // INTO the Aggregate's output list; the rule must treat constant
    // outputs as pass-through instead of bailing to the join-only rewrite
    def q() = naiveAgg()
      .select(col("c_custkey"), col("n_match"), lit(true).as("tag"))
      .orderBy("c_custkey")
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule: avg decomposes as (sum, count) partials — null/unmatched groups exact") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(5L), Some("a")),
      (Some(1L), Some(6L), None),
      (Some(2L), None, Some("b")),
      (None, Some(5L), Some("zz")),
      (Some(3L), None, None),
      (Some(4L), Some(9L), Some("b"))
    ).toDF("g", "k1", "k2")
    // long-valued v: branch partial sums are exact, so the rule's
    // sum/count division is bit-identical to the single-aggregate plan
    val right = Seq(
      (Some(5L), Some("x"), Some(100L)),
      (Some(5L), Some("y"), None),
      (Some(6L), Some("a"), Some(300L)),
      (None, Some("b"), Some(400L))
    ).toDF("r1", "r2", "v")
    def q() = left.join(right,
        col("k1") === col("r1") || col("k2") === col("r2"), "left")
      .groupBy("g")
      .agg(avg(col("v")).as("a"), count(col("v")).as("n"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule: decimal avg falls back to the join rewrite") {
    import spark.implicits._
    val left = Seq((1L, 5L), (2L, 9L)).toDF("g", "k1")
    val right = Seq((5L, BigDecimal("1.10")), (5L, BigDecimal("2.30")))
      .toDF("r1", "v")
    def q() = left.join(right,
        col("k1") === col("r1") || col("g") === col("r1"), "left")
      .groupBy("g").agg(avg(col("v")).as("a"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      assert(df.queryExecution.executedPlan.toString.contains("Union"))
      assert(canon(df) === expected)
    }
  }

  test("agg rule: scalar arithmetic around aggregates rewrites through") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // the repo's own decimal-exactness idiom — CAST(SUM(DECIMAL) AS
    // DOUBLE) — plus arithmetic over a SHARED aggregate call: all must
    // take the eager plan, with the merge substituted INSIDE the scalar
    // expression shape
    def q() = naiveOrJoin().groupBy("c_custkey")
      .agg((count(col("s_suppkey")) * 2 + 1).as("n2x"),
        sum(col("s_acctbal").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("bal"),
        (count(col("s_suppkey")) + count(col("s_suppkey"))).as("n_twice"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule: 2-pred count/sum/avg is ORDER-ROBUST (inclusion–exclusion plan)") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // WORST order: the exploding 25-value nationkey predicate written
    // SECOND. The branch form would materialize the quadratic pair set
    // in branch 1; the IE plan pre-aggregates all three terms on their
    // keys, so no join output exceeds |left| rows regardless of order.
    val lk = Lake(spark, sf0001)
    def q() = lk.customer.join(lk.supplier,
        col("c_name") === col("s_name") ||
          col("c_nationkey") === col("s_nationkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("s_suppkey")).as("n_match"),
        sum(col("s_acctbal").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("bal"),
        avg(col("s_acctbal")).as("avg_bal"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule IE law: null keys, null groups, unmatched lefts, overlap pairs") {
    import spark.implicits._
    // rows matching BOTH predicates exercise the subtracted overlap term
    val left = Seq(
      (Some(1L), Some(5L), Some("x")),   // k1=5 AND k2='x' both match r1
      (Some(1L), Some(6L), None),
      (Some(2L), None, Some("y")),
      (None, Some(5L), Some("zz")),
      (Some(3L), None, None)
    ).toDF("g", "k1", "k2")
    val right = Seq(
      (Some(5L), Some("x"), Some(100L)), // satisfies both preds vs row 1
      (Some(5L), Some("y"), None),
      (Some(6L), Some("y"), Some(300L)),
      (None, Some("x"), Some(400L))
    ).toDF("r1", "r2", "v")
    for (preds <- Seq(
        col("k1") === col("r1") || col("k2") === col("r2"),
        col("k2") === col("r2") || col("k1") === col("r1"))) {
      def q() = left.join(right, preds, "left").groupBy("g")
        .agg(count(col("v")).as("n"), sum(col("v")).as("s"),
          avg(col("v")).as("a"))
      val expected = withRule(on = false) { canon(q()) }
      withRule(on = true) {
        val df = q()
        assert(!df.queryExecution.executedPlan.toString.contains("Union"))
        assert(canon(df) === expected, s"preds=$preds")
      }
    }
  }

  test("agg rule: 3-pred count/sum/avg is ORDER-ROBUST (7-term inclusion–exclusion)") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // WORST order: the exploding 25-value nationkey predicate written
    // LAST of three. The branch form would materialize the quadratic
    // pair set in branch 2; the generalized IE plan pre-aggregates all
    // 7 subset terms (3 singletons + 3 pairs + 1 triple) on their
    // composite keys, so no join output exceeds |left| rows.
    val lk = Lake(spark, sf0001)
    def q() = lk.customer.join(lk.supplier,
        col("c_name") === col("s_name") ||
          col("c_acctbal") === col("s_acctbal") ||
          col("c_nationkey") === col("s_nationkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("s_suppkey")).as("n_match"),
        sum(col("s_acctbal").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("bal"),
        avg(col("s_acctbal")).as("avg_bal"),
        min(col("s_name")).as("first_sup"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule IE law at n=3: triple overlaps, null keys, all 6 predicate orders") {
    import spark.implicits._
    // row 1 of left matches r-row 1 on ALL THREE predicates — the
    // triple-intersection term must re-ADD what the three pairwise
    // terms over-subtracted; duplicate right matches per predicate
    // exercise multiplicity
    val left = Seq(
      (Some(1L), Some(5L), Some("x"), Some(7L)),
      (Some(1L), Some(6L), None, Some(8L)),
      (Some(2L), None, Some("y"), Some(7L)),
      (None, Some(5L), Some("zz"), None),
      (Some(3L), None, None, None)
    ).toDF("g", "k1", "k2", "k3")
    val right = Seq(
      (Some(5L), Some("x"), Some(7L), Some(100L)), // all three vs left row 1
      (Some(5L), Some("y"), Some(8L), None),
      (Some(6L), Some("y"), Some(7L), Some(300L)),
      (None, Some("x"), Some(7L), Some(400L)),
      (Some(5L), Some("x"), None, Some(500L))      // two of three vs row 1
    ).toDF("r1", "r2", "r3", "v")
    val ps = Seq(
      col("k1") === col("r1"),
      col("k2") === col("r2"),
      col("k3") === col("r3"))
    for (order <- ps.permutations.toSeq) {
      def q() = left.join(right, order.reduce(_ || _), "left").groupBy("g")
        .agg(count(col("v")).as("n"), sum(col("v")).as("s"),
          avg(col("v")).as("a"), max(col("r2")).as("mx"))
      val expected = withRule(on = false) { canon(q()) }
      withRule(on = true) {
        val df = q()
        assert(!df.queryExecution.executedPlan.toString.contains("Union"))
        assert(canon(df) === expected, s"order=$order")
      }
    }
  }

  test("agg rule: withColumn-derived group AND join keys freshen correctly") {
    import spark.implicits._
    // Alias-defined attributes (withColumn) used to keep their exprIds
    // through freshen(), putting ONE id on both sides of the attach
    // merge joins; freshen now re-aliases Project/Aggregate/Window
    // outputs, so the eager plan must fire AND be correct here.
    val left = Seq((1L, 5L, "a"), (2L, 6L, "b"), (3L, 9L, "b"),
        (4L, 5L, "zz"), (5L, 7L, "a"))
      .toDF("id", "b", "s")
      .withColumn("g", col("id") % 2)          // computed GROUP key
      .withColumn("k1", col("b") + 1)          // computed JOIN key
    val right = Seq((6L, "a", 100L), (6L, "b", 200L), (7L, "b", 300L),
        (10L, "zz", 400L))
      .toDF("rb", "r2", "v")
      .withColumn("r1", col("rb") * 1L)        // computed RIGHT join key
    def q() = left.join(right,
        col("k1") === col("r1") || col("s") === col("r2"), "left")
      .groupBy("g")
      .agg(count(col("v")).as("n"), sum(col("v")).as("sm"),
        min(col("r2")).as("mn"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule: min/max-only is ORDER-ROBUST at any n (per-predicate LEAST/GREATEST terms)") {
    // exploding nationkey predicate written SECOND with MIN/MAX
    // consumers: the per-predicate-term form must fire (no branch-form
    // order contract), every term pre-aggregated on its own key
    val lk = Lake(spark, sf0001)
    def q() = lk.customer.join(lk.supplier,
        col("c_name") === col("s_name") ||
          col("c_nationkey") === col("s_nationkey"), "left")
      .groupBy("c_custkey")
      .agg(min(col("s_name")).as("mn"), max(col("s_acctbal")).as("mx"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule: min/max-only at n=3, all predicate orders agree") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(5L), Some("x"), Some(7L)),
      (Some(1L), Some(6L), None, None),
      (Some(2L), None, Some("y"), Some(8L)),
      (None, Some(5L), Some("zz"), Some(7L)),
      (Some(3L), None, None, None)
    ).toDF("g", "k1", "k2", "k3")
    val right = Seq(
      (Some(5L), Some("x"), Some(7L), Some(100L)),
      (Some(5L), Some("y"), None, None),
      (Some(6L), Some("y"), Some(8L), Some(300L)),
      (None, Some("x"), Some(7L), Some(400L))
    ).toDF("r1", "r2", "r3", "v")
    val preds = Seq(
      col("k1") === col("r1"),
      col("k2") === col("r2"),
      col("k3") === col("r3"))
    for (order <- preds.permutations.take(3)) {
      def q() = left.join(right, order.reduce(_ || _), "left")
        .groupBy("g")
        .agg(min(col("v")).as("mn"), max(col("r2")).as("mx"))
      val expected = withRule(on = false) { canon(q()) }
      withRule(on = true) {
        val df = q()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Union"), plan)
        assert(canon(df) === expected, s"order=$order")
      }
    }
  }

  test("agg rule: min/max MIXED with count/sum at n=2 rides the IE plan, both orders") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(5L), Some("x")),
      (Some(1L), Some(6L), None),
      (Some(2L), None, Some("y")),
      (None, Some(5L), Some("zz")),
      (Some(3L), None, None)
    ).toDF("g", "k1", "k2")
    val right = Seq(
      (Some(5L), Some("x"), Some(100L)),  // matches both preds vs row 1
      (Some(5L), Some("y"), None),
      (Some(6L), Some("y"), Some(300L)),
      (None, Some("x"), Some(400L))
    ).toDF("r1", "r2", "v")
    for (cond <- Seq(
        col("k1") === col("r1") || col("k2") === col("r2"),
        col("k2") === col("r2") || col("k1") === col("r1"))) {
      def q() = left.join(right, cond, "left").groupBy("g")
        .agg(count(col("v")).as("n"), min(col("v")).as("mn"),
          max(col("r2")).as("mx"), avg(col("v")).as("a"))
      val expected = withRule(on = false) { canon(q()) }
      withRule(on = true) {
        val df = q()
        assert(!df.queryExecution.executedPlan.toString.contains("Union"))
        assert(canon(df) === expected, s"cond=$cond")
      }
    }
  }

  test("agg rule: count(*) is NOT eager-aggregated (falls back to join rewrite)") {
    // count(*) counts unmatched left rows as 1, which branch partials
    // cannot reconstruct — the rule must leave the aggregate alone and
    // rewrite only the join underneath (Union plan), results unchanged.
    def q() = naiveOrJoin().groupBy("c_custkey").agg(count(lit(1)).as("n"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule: left-side aggregate args fall back to join rewrite") {
    def q() = naiveOrJoin().groupBy("c_custkey")
      .agg(min(col("c_name")).as("m"), count(col("s_suppkey")).as("n"))
    val expected = withRule(on = false) { canon(q()) }
    withRule(on = true) {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Union"), plan)
      assert(canon(df) === expected)
    }
  }

  test("agg rule property law: randomized fixtures, 1-3 preds, mixed aggs, rule-on ≡ rule-off") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 6) {
      def maybe[T](v: T): Option[T] = if (rnd.nextInt(5) == 0) None else Some(v)
      // small domains force duplicate groups, duplicate keys, multi-matches
      val left = Seq.fill(40)((
        maybe(rnd.nextInt(6).toLong),             // g
        maybe(rnd.nextInt(8).toLong),             // k1
        maybe(s"s${rnd.nextInt(8)}"),             // k2
        maybe(rnd.nextInt(9).toLong)              // k3
      )).toDF("g", "k1", "k2", "k3")
      val right = Seq.fill(25)((
        maybe(rnd.nextInt(8).toLong),             // r1
        maybe(s"s${rnd.nextInt(8)}"),             // r2
        maybe(rnd.nextInt(9).toLong),             // r3
        maybe(rnd.nextInt(100).toLong)            // v
      )).toDF("r1", "r2", "r3", "v")
      val allPreds = Seq(
        col("k1") === col("r1"),
        col("k2") === col("r2"),
        col("k3") === col("r3"))
      val nPreds = 1 + rnd.nextInt(3)
      val cond = allPreds.take(nPreds).reduce(_ || _)
      def q() = left.join(right, cond, "left")
        .groupBy("g")
        .agg(count(col("v")).as("n"), sum(col("v")).as("s"),
          min(col("r2")).as("mn"), max(col("r2")).as("mx"),
          avg(col("v")).as("a"))
      val expected = withRule(on = false) { canon(q()) }
      withRule(on = true) {
        val df = q()
        if (nPreds >= 2) {
          val plan = df.queryExecution.executedPlan.toString
          assert(!plan.contains("Union"), s"trial $trial: agg case must fire\n$plan")
        }
        assert(canon(df) === expected, s"trial $trial nPreds=$nPreds diverged")
      }
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

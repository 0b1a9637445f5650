package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Laws for the mergeable HLL distinct sketches — the properties that
  * make COUNT(DISTINCT) algebraic for incremental maintenance:
  * merge-schedule independence, replay idempotence, the HIP-vs-composite
  * estimator relation, parquet round-trip, and the loud lgK mismatch. */
class SketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 40k rows / ~2.5k distinct keys per group across 4 groups — coupon
  // (exact) mode at lgK=12; the dense-mode behavior gets a dedicated
  // 60k-distinct slab in its own test below.
  private def rows = (0 until 40000).map { i =>
    (s"g${i % 4}", (i % 10000).toLong, i % 8)
  }.toDF("g", "v", "slice")

  private def est(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    Sketches.withEstimate(df).select("g", "distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap // estimate is LONG

  test("merge-schedule independence: any union schedule gives the same estimate") {
    val partials = Sketches.sketchBy(rows, Seq("g", "slice"), "v")
    val oneShot = est(Sketches.rollup(partials, Seq("g")))
    // staged: slices → parity pairs → total
    val staged = est(Sketches.rollup(
      Sketches.rollup(partials.withColumn("p", pmod(col("slice"), lit(2))),
        Seq("g", "p")), Seq("g")))
    assert(oneShot === staged)
    // and mergeInto (the IVM join) agrees with rollup over the same split
    val odd = Sketches.rollup(partials.where(col("slice") % 2 === 1), Seq("g"))
    val even = Sketches.rollup(partials.where(col("slice") % 2 === 0), Seq("g"))
    assert(est(Sketches.mergeInto(even, odd, Seq("g"))) === oneShot)
  }

  test("replay idempotence: merging an already-merged delta is a no-op") {
    val base = Sketches.sketchBy(rows.where(col("slice") < 6), Seq("g"), "v")
    val delta = Sketches.sketchBy(rows.where(col("slice") >= 6), Seq("g"), "v")
    val once = Sketches.mergeInto(base, delta, Seq("g"))
    val twice = Sketches.mergeInto(once, delta, Seq("g"))
    assert(est(once) === est(twice))
  }

  test("mergeInto keeps groups present on only one side") {
    val left = Sketches.sketchBy(
      Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("g", "v"), Seq("g"), "v")
    val right = Sketches.sketchBy(
      Seq(("b", 9L), ("c", 1L)).toDF("g", "v"), Seq("g"), "v")
    val merged = est(Sketches.mergeInto(left, right, Seq("g")))
    // coupon mode at these cardinalities: estimates are exact
    assert(merged("a") === 2.0 && merged("c") === 1.0)
    assert(merged("b") === 2.0, "overlapping group must union, not replace")
  }

  test("estimate is within the configured error of exact, dense mode included") {
    // one group with 60k distinct values — dense HLL at lgK=12
    val big = (0 until 60000).map(i => ("big", i.toLong)).toDF("g", "v")
    val e = est(Sketches.sketchBy(big, Seq("g"), "v"))("big")
    assert(math.abs(e - 60000.0) <= 60000.0 * 0.05,
      s"dense-mode estimate $e strayed >5% from 60000")
    // HIP (stream-built) vs composite (union-built) agree within the
    // bound, not necessarily bit-for-bit — the q49 caveat
    val sliced = big.withColumn("slice", pmod(col("v"), lit(4)))
    val partials = Sketches.sketchBy(sliced, Seq("g", "slice"), "v")
    val viaUnion = est(Sketches.rollup(partials, Seq("g")))("big")
    assert(math.abs(viaUnion - e) <= 60000.0 * 0.05)
    // schedule independence holds EXACTLY even in dense mode: pairwise
    // staged union equals the one-shot union
    val stagedDense = est(Sketches.rollup(
      Sketches.rollup(partials.withColumn("p", pmod(col("slice"), lit(2))),
        Seq("g", "p")), Seq("g")))("big")
    assert(stagedDense === viaUnion)
  }

  test("sketch columns survive a parquet round trip") {
    val dir = java.nio.file.Files.createTempDirectory("sketch_rt").toString
    // checkpoint so the written bytes and the in-memory comparison come
    // from ONE materialized sketch — re-running the aggregation can
    // shift an HLL-mode estimate by ±1 with partial-merge order
    val pre = Sketches.sketchBy(rows, Seq("g"), "v").localCheckpoint(true)
    val preEst = est(pre)
    pre.write.mode("overwrite").parquet(dir)
    assert(est(spark.read.parquet(dir)) === preEst)
    // ...and a reloaded sketch still unions with a fresh delta —
    // coupon-mode group, where estimates are exact counts
    val sdir =
      java.nio.file.Files.createTempDirectory("sketch_rt2").toString + "/t"
    val small = Seq.tabulate(50)(i => ("s", i.toLong)).toDF("g", "v")
    Sketches.sketchBy(small, Seq("g"), "v").write.parquet(sdir)
    val bumped = Sketches.mergeInto(spark.read.parquet(sdir),
      Sketches.sketchBy(Seq(("s", -1L)).toDF("g", "v"), Seq("g"), "v"),
      Seq("g"))
    assert(est(bumped)("s") === 51.0)
  }

  test("lgK mismatch fails loudly instead of silently degrading the bound") {
    val a = Sketches.sketchBy(rows.where(col("g") === "g0"), Seq("g"), "v", lgK = 12)
    val b = Sketches.sketchBy(rows.where(col("g") === "g0"), Seq("g"), "v", lgK = 10)
      .withColumn("g", lit("g0"))
    val ex = intercept[Exception] {
      Sketches.rollup(a.unionByName(b), Seq("g")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("lgconfigk") ||
      ex.getMessage.toLowerCase.contains("sketch"),
      s"unexpected failure mode: ${ex.getMessage.take(200)}")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, surfaced
  * through Spark's `hll_sketch_agg` family) — the scale remedy for the
  * one aggregate the incremental-maintenance story cannot otherwise
  * cover. SUM/COUNT/MIN/MAX are algebraic, so [[LakeMaintenance]]'s IVM
  * merges partials; COUNT(DISTINCT) is holistic — a stored per-day
  * distinct count cannot be combined with a delta without re-scanning
  * history, which at 100 TB means the nightly "unique users to date"
  * query re-reads the lake. A sketch makes distinct algebraic again:
  *
  *  - a per-slice sketch is a few KB (≤ ~2^lgK registers), independent
  *    of slice size;
  *  - union is associative, commutative and IDEMPOTENT (registers
  *    combine by max), so replayed batches and overlapping slices are
  *    harmless — exactly the property an exactly-once-ish pipeline wants;
  *  - register max-merge is associative, so the union of same-lgK
  *    partials gives the SAME estimate under any merge schedule — the
  *    incremental answer is independent of how history was batched
  *    (q49's gate compares two schedules inside one plan). One caveat,
  *    pinned by SketchSpec: a never-unioned stream sketch estimates via
  *    HIP, union results via the composite estimator — those two agree
  *    within the error bound, not bit-for-bit, once past coupon mode.
  *
  * Estimate error is ~1.04/sqrt(2^lgK) (≈1.6% at the default lgK=12);
  * below ~0.75·2^lgK distinct values the sketch is still in its exact
  * (coupon) mode and the estimate is the true count. Sketch columns are
  * plain BINARY — they persist to Parquet like any column, so a sketch
  * table maintained by [[mergeInto]] is itself a snapshot the lake ops
  * (versioning, time travel) apply to unchanged.
  */
object Sketches {

  /** Per-group sketch partials: one BINARY `hll` column per group.
    * Map-side partial aggregation does the heavy lifting — each task
    * emits one ≤~2^lgK-byte state per group, so the shuffle carries
    * sketches, never rows. */
  def sketchBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll partials up to a coarser grouping (e.g. (type, day) → type).
    * Same-lgK unions only — a silent lgK downgrade would quietly change
    * the error bound, so mismatches fail loudly. */
  def rollup(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll"), lit(false)).as("hll"))

  /** Adds the cardinality estimate for the `hll` column. */
  def withEstimate(df: DataFrame, estCol: String = "distinct_est"): DataFrame =
    df.withColumn(estCol, hll_sketch_estimate(col("hll")))

  /** IVM merge of a delta batch's partials into a stored sketch table:
    * full-outer join on the group key, union where both sides exist,
    * pass-through where only one does. Because union is idempotent,
    * replaying an already-merged delta is a state-level no-op — the
    * crash-replay guarantee [[LakeMaintenance.upsertIntoSnapshot]] gives
    * rows, extended to sketch state. Both sides are keyed aggregates
    * (small relative to the data), and the join is an equi-join on the
    * group columns — broadcastable whenever the group domain is. */
  def mergeInto(existing: DataFrame, delta: DataFrame,
                groupCols: Seq[String]): DataFrame = {
    val e = existing.withColumnRenamed("hll", "hll_e")
    val d = delta.withColumnRenamed("hll", "hll_d")
    e.join(d, groupCols, "full_outer")
      .withColumn("hll",
        when(col("hll_e").isNull, col("hll_d"))
          .when(col("hll_d").isNull, col("hll_e"))
          .otherwise(hll_union(col("hll_e"), col("hll_d"))))
      .drop("hll_e", "hll_d")
  }
}

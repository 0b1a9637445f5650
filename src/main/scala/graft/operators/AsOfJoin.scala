package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the single most recent right
  * row with `rightTime <= leftTime` within the same key group.
  *
  * Spark has no native as-of join. The naive composition — inequality join
  * then per-left-row max — shuffles |L| x avg-matches rows and pays a
  * second aggregation. This implementation is the single-shuffle
  * sort-based form:
  *
  *   1. tag and union both inputs on (key, time),
  *   2. one window per key ordered by (time, side): rights sort before
  *      lefts at equal timestamps (ties are matches, like SQL ASOF `>=`),
  *   3. `last(rightStruct, ignoreNulls)` carries the latest right row
  *      forward; every left row then reads its match from the running
  *      state,
  *   4. keep left rows, unpack both structs.
  *
  * One hash exchange on the key + one sort — the same cost profile as a
  * sort-merge join, independent of match fan-out. At 100 TB this is the
  * difference between an as-of enrichment being a join and being a blowup.
  */
object AsOfJoin {

  /** `left ASOF LEFT JOIN right ON keys AND right(rightTime) <= left(leftTime)`.
    * Right columns appear prefixed with `rightPrefix`, null when no prior
    * right row exists.
    *
    * `tolerance` bounds the lookback: a carried-forward match older than
    * `leftTime - tolerance` is nulled out (the match column stays present,
    * the row is kept — LEFT semantics). Expressed as a post-filter on the
    * carried struct, so the single-shuffle plan shape is unchanged; pass
    * a literal in the time column's own units (e.g. micros for epoch
    * longs, or an INTERVAL expression for timestamps). */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPrefix: String = "asof_",
                   tolerance: Option[Column] = None): DataFrame = {
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(right.columns.toIndexedSeq.map(col): _*).as("__r")): _*)
    val lAug = l.withColumn("__r", lit(null).cast(r.schema("__r").dataType))
    val rAug = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .select(lAug.columns.toIndexedSeq.map(col): _*)

    // __r as the final sort key makes the choice among duplicate
    // (key, time) right rows deterministic: last() picks the greatest
    // right row in struct field order, independent of partitioning and
    // input order (same convention as Dedup.dedupExact's tie-break).
    // Requires right columns to be orderable types (no maps) — true of
    // every relational schema this engine targets.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lAug.unionByName(rAug)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case Some(tol) => carried.withColumn("__match",
        when(col(s"__match.$rightTime") >= col("__t") - tol, col("__match")))
      case None => carried
    }
    gated
      .where(col("__side") === 1)
      .select(
        left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
          right.columns.toIndexedSeq.map(c => col(s"__match.$c").as(rightPrefix + c)): _*)
  }
}

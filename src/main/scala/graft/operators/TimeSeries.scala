package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over integer step indexes (hour numbers,
  * day numbers — anything equally spaced): densify each key's series to
  * a gap-free grid and carry the last observation forward (LOCF), the
  * standard resampling step before windowed feature extraction.
  */
object TimeSeries {

  /** Dense per-key grid from each key's min to max step, left-joined
    * back to the observations, missing steps filled with the most recent
    * prior value. Adds `is_gap` (true where the step had no
    * observation). `valCol` must not contain observed nulls (an observed
    * null is indistinguishable from a gap after the fill).
    *
    * Scale shape: the grid derives from a per-key min/max aggregate and
    * a `sequence` explode — its size is keys × steps, a function of
    * CALENDAR SPAN, not event volume, so the fill window (partitioned by
    * key, ordered by step) is bounded the same way. The event table
    * itself contributes one hash aggregate + one hash join, both keyed
    * on (key, step). */
  def gapFillLocf(df: DataFrame, keyCol: String, stepCol: String,
                  valCol: String): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(stepCol)).as("mn"), max(col(stepCol)).as("mx"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("mn"), col("mx"))).as(stepCol))
    val w = Window.partitionBy(keyCol).orderBy(stepCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df, Seq(keyCol, stepCol), "left")
      .withColumn("is_gap", col(valCol).isNull)
      .withColumn(valCol, last(col(valCol), ignoreNulls = true).over(w))
  }
}

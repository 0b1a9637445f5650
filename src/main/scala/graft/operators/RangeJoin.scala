package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded (binned) range join: all (left, right) pairs with
  * `|leftVal - rightVal| <= width`.
  *
  * A bare BETWEEN predicate has no equi-key, so Catalyst plans a nested
  * loop — O(|L| x |R|). Binning restores a hash key: values bucket into
  * `floor(v / width)`; any pair within `width` lands in the same or an
  * adjacent bucket, so the left side probes buckets {b-1, b, b+1} and the
  * exact predicate filters the candidates. Each right row owns exactly one
  * bucket, so no pair can match twice — no dedup stage needed. Cost:
  * a 3x explode of the left keys and one hash join, instead of a
  * cross product; bucket width tunes selectivity vs fan-out. */
object RangeJoin {

  def binnedRangeJoin(left: DataFrame, right: DataFrame,
                      leftVal: String, rightVal: String,
                      width: Double): DataFrame = {
    require(width > 0, "width must be positive")
    val lBinned = left.withColumn("__probe",
      explode(array((-1 to 1).map(d =>
        floor(col(leftVal) / width).cast(LongType) + d): _*)))
    val rBinned = right.withColumn("__bin",
      floor(col(rightVal) / width).cast(LongType))
    lBinned
      .join(rBinned, col("__probe") === col("__bin"))
      .where(abs(col(leftVal) - col(rightVal)) <= width)
      .drop("__probe", "__bin")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval-overlap join: all (left, right) pairs whose half-open
  * intervals intersect — `lStart < rEnd AND rStart < lEnd` — optionally
  * within key groups. The two-sided generalization of [[RangeJoin]]
  * (a point within a band is an interval of width 0 vs one of width 2w).
  *
  * The overlap predicate alone has no equi-key, so Catalyst would plan a
  * nested loop — O(|L| x |R|) even when almost nothing overlaps. Binning
  * restores a hash key: time splits into `binWidth`-sized bins, each
  * interval registers in every bin its span covers, and candidates meet
  * in (key, bin). Overlapping intervals share at least one bin by
  * construction; the exact predicate filters the candidates.
  *
  * A pair sharing several bins must emit ONCE without a distinct (a
  * shuffle + full-row compare at 100 TB): the pair is kept only in its
  * FIRST common bin, `max(floor(lStart/w), floor(rStart/w))` — a
  * row-local predicate, no extra exchange. Cost: explode factor =
  * interval span / binWidth per side + one hash join; size binWidth to
  * the typical interval length so most intervals register in O(1) bins. */
object IntervalJoin {

  /** Interval columns are exact integers (epoch-micros longs — same
    * convention as the engine's event-time arithmetic); `keys` may be
    * empty for an unkeyed overlap join (global time axis). Output keeps
    * every column of both inputs (right's prefixed on name collision is
    * the caller's concern — pre-alias as needed). */
  def overlaps(left: DataFrame, right: DataFrame, keys: Seq[String],
               lStart: String, lEnd: String,
               rStart: String, rEnd: String,
               binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast(LongType)
    // half-open [start, end): the last covered bin is bin(end - 1);
    // empty/negative-length intervals cover no bin and match nothing
    val l = left
      .where(col(lStart) < col(lEnd))
      .withColumn("__lb0", bin(col(lStart)))
      .withColumn("__bin", explode(sequence(col("__lb0"), bin(col(lEnd) - 1))))
    val r = right
      .where(col(rStart) < col(rEnd))
      .withColumn("__rb0", bin(col(rStart)))
      .withColumn("__rbin", explode(sequence(col("__rb0"), bin(col(rEnd) - 1))))
    val joined = l.join(r, keys.map(k => l(k) === r(k))
        .foldLeft(col("__bin") === col("__rbin"))(_ && _))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .drop("__bin", "__rbin", "__lb0", "__rb0")
    keys.foldLeft(joined)((df, k) => df.drop(r(k)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (temporal) join: each fact row picks up the dimension
  * VERSION that was valid at the fact's timestamp — the canonical lookup
  * against an SCD Type-2 history (`q38_scd2_intervals` builds one).
  *
  * Semantics: for fact time t and per-key versions carrying
  * `[validFrom, validTo)` half-open intervals (open current row:
  * `validTo` null), the match is the unique version with
  * `validFrom <= t AND (validTo IS NULL OR t < validTo)`. Versions may
  * have HOLES (e.g. retention-deleted spans): a fact falling into a hole
  * matches nothing — which is exactly what a plain backward as-of join
  * cannot express.
  *
  * Implementation: [[AsOfJoin.asOfBackward]] on `validFrom` (versions of
  * one key never overlap, so the latest `validFrom <= t` is the only
  * candidate) followed by a row-local `validTo` gate that nulls the
  * matched columns when the candidate's interval closed before t. The
  * gate is a projection — the single-shuffle as-of plan shape (one hash
  * exchange + one sort, fan-out independent) is unchanged, so the 100 TB
  * cost profile is that of a sort-merge join, NOT the |facts| x versions
  * blowup of the naive inequality join.
  */
object TemporalJoin {

  /** `facts PIT LEFT JOIN dim ON keys AND dim.validFrom <= facts(factTime)
    * < dim.validTo` (null `validTo` = open interval). Dim columns appear
    * prefixed with `dimPrefix`, null when no version covers the fact.
    *
    * `factTime`, `validFrom` and `validTo` must share one orderable type
    * (epoch longs or timestamps alike). */
  def pointInTime(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                  factTime: String, validFrom: String, validTo: String,
                  dimPrefix: String = "pit_"): DataFrame = {
    val joined = AsOfJoin.asOfBackward(
      facts, dim, keys, leftTime = factTime, rightTime = validFrom,
      rightPrefix = dimPrefix)
    val to: Column = col(dimPrefix + validTo)
    val covers: Column = to.isNull || col(factTime) < to
    joined.select(
      facts.columns.toIndexedSeq.map(col) ++
        dim.columns.toIndexedSeq.map(c => when(covers, col(dimPrefix + c)).as(dimPrefix + c)): _*)
  }
}

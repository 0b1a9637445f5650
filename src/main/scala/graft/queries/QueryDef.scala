package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle the driver runs on
  * the same Parquet tables.
  *
  * Conventions every query obeys so the driver's hash-compare is stable:
  *  - Deterministic total ordering: final `ORDER BY` on a unique key in
  *    BOTH the Spark plan and the oracle SQL.
  *  - Column names identical on both sides (every computed column aliased).
  *  - Sums of monetary/quantity doubles go through `DECIMAL(18,2+)` so the
  *    result is exact and independent of partial-aggregation order, then
  *    cast back to DOUBLE on both sides.
  *  - Timestamp outputs are `TIMESTAMP_NTZ` (matches DuckDB's naive
  *    TIMESTAMP from the driver tables).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in the Bench headline set */
    headline: Boolean = false)

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, oracleSql: String): Q =
    Q(fn, Some(oracleSql))
  def apply(fn: (SparkSession, String) => DataFrame, oracleSql: String, headline: Boolean): Q =
    Q(fn, Some(oracleSql), headline)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (SURVEY.md §2);
  * each entry pairs the Spark implementation with (where SQL-expressible) a
  * DuckDB oracle in `oracleSql`. Conventions for oracle parity are
  * documented on [[graft.queries.Q]].
  */
object SparkEntry {

  /** Full declared inventory, grouped by module. */
  def all: Map[String, Q] =
    Relational.defs ++ EventsQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs ++ MultimodalQueries.defs ++
      SurfaceQueries.defs ++ JoinQueries.defs ++ CurationQueries.defs ++
      GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema revenue rollup: broadcast dims, exact-decimal aggregate. */
  def entry(spark: SparkSession): DataFrame =
    all("q04_star_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }

  /** Headline subset timed by [[Bench]]. */
  def headline: Map[String, (SparkSession, String) => DataFrame] =
    all.collect { case (name, q) if q.headline => name -> q.fn }
}

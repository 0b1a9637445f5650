package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * One place for every config the engine depends on, so `Verify`, `Bench`,
  * tests, and user code all run with identical semantics:
  *
  *  - `spark.sql.session.timeZone=UTC`: all date-part derivations
  *    (hour/day/week/...) are UTC-deterministic. The reference pipeline
  *    (reference `etl.py:98-131`) inherited whatever zone the cluster ran
  *    in — we pin UTC instead (see SURVEY.md §1, "timestamp semantics").
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: the `events` table
  *    carries Parquet `TIMESTAMP(NANOS)` which Spark 4.x cannot represent;
  *    with the flag the column reads as `bigint` nanos and
  *    [[graft.queries.EventsQueries]] converts explicitly.
  *  - AQE on: runtime join-strategy switching + skew-join splitting +
  *    partition coalescing. This is the engine's first line of defense at
  *    100 TB (skewed keys, misestimated build sides).
  *  - shuffle partitions default low for local runs; a real cluster
  *    deployment overrides via spark-submit conf (AQE coalescing makes the
  *    initial number mostly a ceiling).
  */
object GraftSession {

  /** Apply the engine's semantic configs to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.parquet.compression.codec", "snappy")
    .config("spark.ui.enabled", "false")

  /** Local session for tests/tools. Cores and shuffle partitions track the
    * `SPARK_GRAFT_CPUS` harness contract. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-convention data lake: a directory of Parquet tables, no metastore.
  *
  * Mirrors the reference's storage model — "tables" are just object-store
  * prefixes holding Parquet files (reference `buckets_dropcreate.py:51`
  * creates `tables/{songs,artists,...}/` key prefixes; `etl.py:46-48`
  * writes Hive-partitioned Parquet under them). Here each driver-generated
  * test table is a single `name.parquet` directory under `dir`.
  *
  * At 100 TB these same calls read partitioned/multi-file datasets —
  * `spark.read.parquet` handles directory trees, partition discovery and
  * pruning without code changes here.
  */
final case class Lake(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events` with `ts` normalized to `TimestampType` (µs precision,
    * UTC session). The feed has shipped in two physical generations —
    * epoch-nanos BIGINT and native Parquet TIMESTAMP(MICROS) — so the
    * schema is adapted here, once, and every consumer sees one type.
    * Integer `DIV` for the legacy branch is load-bearing: epoch-nanos
    * (~1.7e18) overflow the 53-bit double mantissa, so float division
    * would corrupt the low microsecond digits. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = table("events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view — the SQL-text surface. */
  def registerViews(): Unit = Lake.tableNames.foreach { n =>
    table(n).createOrReplaceTempView(n)
  }
}

object Lake {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")
}

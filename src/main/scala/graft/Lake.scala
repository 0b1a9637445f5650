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
  def events: DataFrame     = table("events")
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

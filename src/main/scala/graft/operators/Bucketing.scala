package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time, join for free
  * forever after.
  *
  * A fact-to-fact join (orders x lineitem at 100 TB) shuffles both sides
  * on every query. Writing both tables bucketed by the join key with the
  * same bucket count moves that shuffle to write time: Catalyst sees
  * compatible `HashPartitioning` on both scans and plans the sort-merge
  * join with NO Exchange (verified in BucketingSpec). `sortBy` on the
  * bucket key additionally lets single-file buckets skip the sort.
  *
  * This is the path-convention lake's answer to "reuse a partitioning
  * across stages": the partitioning lives in the table layout, not the
  * query plan. */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}

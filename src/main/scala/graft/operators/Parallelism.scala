package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard against under-partitioned inputs ahead of CPU-heavy stages.
  *
  * A small single-row-group Parquet file scans as ONE partition, which
  * serializes everything downstream of it (hashing, shingling, cosine
  * scans) onto one core regardless of cluster size. At real scale inputs
  * arrive as many files/row-groups and this is a no-op — the repartition
  * only fires when the scan's parallelism is below the cluster's, so the
  * cost is a shuffle of data that is by definition small. */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

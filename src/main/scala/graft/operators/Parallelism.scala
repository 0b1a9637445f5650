package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Guard against under-partitioned inputs ahead of CPU-heavy stages.
  *
  * A small single-row-group Parquet file scans as ONE partition, which
  * serializes everything downstream of it (hashing, shingling, cosine
  * scans) onto one core regardless of cluster size. At real scale inputs
  * arrive as many files/row-groups and this is a no-op — the repartition
  * only fires when the scan's parallelism is below the cluster's, so the
  * cost is a shuffle of data that is by definition small.
  *
  * The probe works from FILE METADATA only — `inputFiles` plus a few
  * FileStatus calls, replaying Spark's own split formula
  * (FilePartition.maxSplitBytes: packed splits of
  * min(maxPartitionBytes, max(openCostInBytes, totalWork/minPartitionNum))).
  * The previous `df.rdd.getNumPartitions` probe forced a full extra
  * planning pass + RDD DAG per wrapped query and would throw on a
  * streaming DataFrame; streaming and non-file sources now fall through
  * untouched (`inputFiles` is empty for them), and the short-circuit on
  * `files >= target` means large tables never pay a single FileStatus
  * RPC. */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch planner owns parallelism
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    // >= target files can only split further, never coalesce below one
    // partition per file-split bin in the small-file case we guard;
    // empty = non-file source (streaming, local relation): hands off
    if (files.isEmpty || files.length >= target) return df
    def bytesConf(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(JavaUtils.byteStringAsBytes).getOrElse(dflt)
    val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L * 1024 * 1024)
    val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
    val minPartitionNum = spark.conf.getOption("spark.sql.files.minPartitionNum")
      .flatMap(_.toIntOption).getOrElse(target)
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalWork = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val len =
        try p.getFileSystem(hconf).getFileStatus(p).getLen
        catch { case _: Exception => 0L }
      len + openCost
    }.sum
    val maxSplitBytes = math.min(maxPartitionBytes,
      math.max(openCost, totalWork / math.max(1, minPartitionNum)))
    val estPartitions = math.max(1L,
      math.ceil(totalWork.toDouble / maxSplitBytes).toLong)
    if (estPartitions < target) df.repartition(target) else df
  }
}

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
  def ensure(df: DataFrame): DataFrame = spreadTo(df, _ => 0L)

  /** [[ensure]] with a WORK FLOOR per task: spread to at most
    * ceil(inputBytes / minBytesPerTask) partitions (still capped at the
    * cluster's parallelism). For stages whose per-row cost is a fused
    * codegen kernel (the vector paths since round 19), per-task fixed
    * overhead (~tens of ms: scheduling, codegen class init, cache-batch
    * decode) dominates below ~1 MB of input per task — profiled on
    * s17/s18: 32-way spreading of a 0.5 MB fit input cost ~10 s of task
    * time where 4-way cost 0.9 s for the same rows. Scale-adaptive by
    * construction: the floor derives the partition count from input
    * SIZE, so big inputs still spread to every core and genuinely large
    * tables short-circuit before any FileStatus call, exactly as
    * [[ensure]] does. Interpreted/CPU-per-byte-heavy consumers
    * (shingling, hashing, annotate) should stay on [[ensure]] — their
    * work floor is far below 1 MB/task. */
  def spread(df: DataFrame, minBytesPerTask: Long): DataFrame =
    // ceil, floored at 1: plain floor division returns 0 for inputs
    // smaller than one task's floor, which collides with the `byWork <= 0`
    // "ensure semantics" sentinel below and would spread the tiniest
    // inputs to every core — the exact overhead this floor exists to
    // prevent (ADVICE r19)
    spreadTo(df, totalWork => math.max(1L,
      math.ceil(totalWork.toDouble / math.max(1L, minBytesPerTask)).toLong))

  private def spreadTo(df: DataFrame, maxByWork: Long => Long): DataFrame = {
    if (df.isStreaming) return df // micro-batch planner owns parallelism
    val spark = df.sparkSession
    val targetAll = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    // >= target files can only split further, never coalesce below one
    // partition per file-split bin in the small-file case we guard;
    // empty = non-file source (streaming, local relation): hands off
    if (files.isEmpty || files.length >= targetAll) return df
    def bytesConf(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(JavaUtils.byteStringAsBytes).getOrElse(dflt)
    val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L * 1024 * 1024)
    val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
    val minPartitionNum = spark.conf.getOption("spark.sql.files.minPartitionNum")
      .flatMap(_.toIntOption).getOrElse(targetAll)
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
    // work floor: don't spread below minBytesPerTask of input per task
    // (maxByWork = 0 → plain ensure semantics, spread to every core)
    val byWork = maxByWork(totalWork)
    val target =
      if (byWork <= 0) targetAll.toLong
      else math.max(1L, math.min(targetAll.toLong, byWork))
    if (estPartitions < target) df.repartition(target.toInt) else df
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query set on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through the `noop`
  * sink so Catalyst cannot prune work the way a bare `count()` would. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.headline.toSeq.sortBy(_._1)
    // None = the run failed; a failed (fast) rep must never win best-of-N
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    // Warmup pass: JVM/codegen compilation and file-system cache dominate
    // the first execution of each plan shape. Then report best-of-N per
    // query so round-over-round deltas reflect the code, not scheduler /
    // GC jitter (SPARK_GRAFT_BENCH_REPS to override; floored at 1).
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    queries.foreach { case (n, f) => runOne(n, f) }
    val results = queries.map { case (name, fn) =>
      val ok = (0 until reps).flatMap(_ => runOne(name, fn))
      name -> (if (ok.isEmpty) -1.0 else ok.min) // -1 marks all-reps-failed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

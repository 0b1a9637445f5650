package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. Warehouse goes to a
  * fresh temp dir so managed-table tests (bucketing) never collide with a
  * previous run's leftovers. */
object TestSpark {
  lazy val spark: SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_wh").toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Schema-contract tripwire (the r8→r9 lesson): a driver-side
    // testdata regeneration that re-types a column must fail LOUDLY by
    // table name up front — not as a scatter of per-query failures a
    // round later. Queries still run (one drifted table must not zero
    // the other tables' correctness rows); the banner + artifact make
    // the drift unmissable.
    val drifted = SchemaContract.drift(Lake(spark, sfDir))
    if (drifted.nonEmpty) {
      System.err.println("=" * 72)
      drifted.foreach(d => System.err.println(s"[verify] SCHEMA DRIFT: $d"))
      System.err.println("=" * 72)
      println(s"""{"metric":"schema_drift","tables":${drifted.size}}""")
    }
    Files.writeString(Paths.get(s"$outDir/schema_drift.txt"),
      drifted.mkString("", "\n", "\n"))
    // Failures are caught per query so one break cannot hide the rest —
    // but they must stay LOUD: a failed query silently vanishes from the
    // driver's CORRECTNESS report (it compares only dumped results), so
    // the summary line + verify_failures.txt make any drop visible both
    // in captured stdout and as an artifact (the round-9 lesson, where a
    // testdata schema change cost 17 queries and nothing flagged it).
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
    println(s"""{"metric":"verify_summary","declared":${SparkEntry.queries.size},"dumped":${SparkEntry.queries.size - failed.size},"failed":${failed.size},"failed_names":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    Files.writeString(Paths.get(s"$outDir/verify_failures.txt"),
      failed.mkString("", "\n", "\n"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

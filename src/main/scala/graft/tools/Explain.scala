package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspector: prints the formatted physical plan for declared queries.
  *
  * Usage: runMain graft.tools.Explain [sfDir] [queryName ...]
  * With no query names, explains every declared query. This is the
  * scale-review loop: check PushedFilters/ReadSchema on scans, broadcast
  * vs shuffle joins, WholeStageCodegen spans (SURVEY.md §4).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.all.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain")
    names.foreach { n =>
      println(s"\n==================== $n ====================")
      SparkEntry.all(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

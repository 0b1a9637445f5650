package graft.tools

import java.nio.file.{Files, Paths}
import graft.GraftSession
import graft.streaming.EventsStream

/** Drive the streaming operators end-to-end over the bounded events feed:
  * stage the parquet into a directory source, run each streaming query to
  * completion on the memory sink, print row counts.
  * Usage: runMain graft.tools.StreamDemo [sfDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("stream-demo")
    val stage = Files.createTempDirectory("events_stream_demo")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val events = EventsStream.readEvents(spark, stage.toString)

    def run(name: String, df: org.apache.spark.sql.DataFrame,
            mode: String): Unit = {
      val q = df.writeStream.outputMode(mode)
        .format("memory").queryName(name).start()
      q.processAllAvailable()
      println(s"STREAM $name rows=${spark.table(name).count()}")
      q.stop()
    }
    run("hourly", EventsStream.hourlyCounts(events), "complete")
    run("dedup", EventsStream.dedupByEventId(events), "append")
    run("p2e", EventsStream.purchaseToError(events), "append")
    run("running", EventsStream.runningUserTotals(spark, events).toDF(), "update")
    spark.stop()
  }
}

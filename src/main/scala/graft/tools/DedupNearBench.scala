package graft.tools

import graft.{GraftSession, Lake}
import graft.operators.Dedup

/** Dev-only: same-JVM timing for the end-to-end dedupNear pipeline. */
object DedupNearBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dedupnear-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Lake(spark, dir).documents
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DN $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (rep <- 1 to 3) {
      t(s"prop_$rep")(Dedup.dedupNear(docs, "doc_id", "text", 3, 64, 8, 0.8).count())
      t(s"star_$rep")(Dedup.dedupNear(docs, "doc_id", "text", 3, 64, 8, 0.8,
        starClustering = true).count())
    }
    spark.stop()
  }
}

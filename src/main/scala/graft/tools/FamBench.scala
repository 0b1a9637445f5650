package graft.tools

import graft.{GraftSession, Lake}
import graft.operators.Dedup

/** Dev-only: same-JVM family timing comparison for minHashLshPairs. */
object FamBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("fam-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Lake(spark, dir).documents
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"FAM $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (rep <- 1 to 3) {
      t(s"xx_$rep")(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.7, Dedup.XxMinHash).count())
      t(s"md5_$rep")(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.7, Dedup.Md5MinHash).count())
      t(s"sig_xx_$rep")(Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64, Dedup.XxMinHash).count())
      t(s"sig_md5_$rep")(Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64, Dedup.Md5MinHash).count())
    }
    spark.stop()
  }
}

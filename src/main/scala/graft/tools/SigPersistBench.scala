package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, Lake}
import graft.operators.Dedup

/** Dev-only: the measured answer to "should d2 persist its MinHash
  * signatures?". The one-shot [[Dedup.minHashLshPairs]] evaluates the
  * signature subtree twice (both sides of the band self-join — no
  * exchange reuse across the broadcast, see ReuseBench); the escape
  * hatch [[Dedup.minHashLshPairsFromSignatures]] takes a persisted
  * signature frame instead. This times both END-TO-END (persist +
  * materialize counted against the persist path, unpersist after) so
  * the number includes the cache's own cost, not just its benefit.
  *
  * Run: `runMain graft.tools.SigPersistBench [sfDir] [reps]`.
  */
object SigPersistBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark: SparkSession = GraftSession.local("sig-persist-bench")
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def oneShot(): Unit =
      noop(Dedup.minHashLshPairs(Lake(spark, dir).documents,
        "doc_id", "text", shingleN = 3, numHashes = 64, bands = 8,
        threshold = 0.7, family = Dedup.Md5MinHash).orderBy("id_a", "id_b"))
    def persisted(): Unit = {
      val docs = Lake(spark, dir).documents
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, family = Dedup.Md5MinHash).persist()
      try {
        noop(Dedup.minHashLshPairsFromSignatures(docs, sigs,
          "doc_id", "text", shingleN = 3, numHashes = 64, bands = 8,
          threshold = 0.7).orderBy("id_a", "id_b"))
      } finally sigs.unpersist(blocking = true)
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // interleaved reps so page-cache / JIT drift hits both variants alike
    oneShot(); persisted() // warmup
    val pairs = (1 to reps).map { r =>
      val o = time(oneShot _); val p = time(persisted _)
      println(f"[sigbench] rep $r: one_shot=$o%.3fs persist=$p%.3fs")
      (o, p)
    }
    val bestO = pairs.map(_._1).min
    val bestP = pairs.map(_._2).min
    println(f"""{"sf":"$dir","reps":$reps,"one_shot_best":$bestO%.3f,"persist_best":$bestP%.3f,"persist_speedup":${bestO / bestP}%.3f}""")
    spark.stop()
  }
}

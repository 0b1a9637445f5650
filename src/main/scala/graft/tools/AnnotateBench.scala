package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Lake}
import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** Dev-only: same-JVM comparison of the c1 annotate stage's two forms —
  * the composable regex pipeline (6 regex scans + 2 splits + 1 replace
  * per row) vs the fused one-pass [[graft.plans.AnnotateStatsExpr]].
  * Both forms are forced through an xxhash64 fold over all four derived
  * columns so column pruning can't skip the work being measured. */
object AnnotateBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("annotate-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Lake(spark, dir).documents
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val v = f
      println(f"ANN $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  v=$v")
    }
    def force(df: org.apache.spark.sql.DataFrame): Any =
      // bit_xor, not sum: an ANSI long-sum of hashes overflows
      df.select(bit_xor(xxhash64(col("lang_pred"), col("quality"),
        col("n_tokens"), col("fp")))).head().get(0)
    def regexForm = docs
      .withColumn("lang_pred", TextFunctions.langIdRegex(col("text")))
      .withColumn("quality", TextFunctions.qualityScoreRegex(col("text")))
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("fp", fingerprintMd5(col("text")))
    def fusedForm = {
      val st = annotateStats(col("text"))
      docs.withColumn("__ann", st)
        .withColumn("lang_pred", langIdFrom(col("__ann")))
        .withColumn("quality", qualityFrom(col("__ann")))
        .withColumn("n_tokens", col("__ann").getField("n_tokens").cast("long"))
        .withColumn("fp", md5(col("__ann").getField("norm")))
        .drop("__ann")
    }
    for (rep <- 1 to 3) {
      t(s"regex_$rep")(force(regexForm))
      t(s"fused_$rep")(force(fusedForm))
      t(s"c1_fused_$rep")(
        graft.queries.CurationQueries.defs("c1_curation")
          .fn(spark, dir).count())
    }
    spark.stop()
  }
}

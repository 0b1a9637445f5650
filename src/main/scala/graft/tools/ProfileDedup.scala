package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Lake}
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Stage-isolation timing for the MinHash-LSH pipeline (dev tool). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("profile-dedup")
    val docs = Lake(spark, dir).documents
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("scan")(docs.count())
    t("scan2")(docs.count())
    t("shingleSet")(docs.select(shingleSet(col("text"), 3).as("sh")).count())
    t("shingleSet2")(docs.select(shingleSet(col("text"), 3).as("sh")).count())
    t("explode_precomputed")(docs
      .select(col("doc_id"), shingleSet(col("text"), 3).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle")).count())
    t("postings_inline")(docs.select(col("doc_id"), explode(shingleSet(col("text"), 3)).as("shingle")).count())
    t("postings_repart")(docs.repartition(32)
      .select(col("doc_id"), explode(shingleSet(col("text"), 3)).as("shingle")).count())
    t("signatures")(Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64).count())
    t("full_lsh")(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.7).count())
    spark.stop()
  }
}

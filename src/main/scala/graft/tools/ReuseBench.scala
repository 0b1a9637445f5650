package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Lake}
import graft.operators.Dedup

/** Dev-only: does an alias-based band self-join reuse the signature
  * exchange (vs the rename-below-exchange form computing it twice)? */
object ReuseBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("reuse-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Lake(spark, dir).documents
    val id = "doc_id"
    val sigs = Dedup.minHashSignatures(docs, id, "text", 3, 64, Dedup.Md5MinHash)
    val rows = 8
    val banded = sigs.select(
      col(id),
      posexplode(array((0 until 8).map(b =>
        xxhash64(slice(col("signature"), b * rows + 1, rows), lit(b))): _*))
        .as(Seq("band", "band_hash")))
    // current form: rename below the exchange
    val a = banded.select(col(id).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(id).as("id_b"), col("band"), col("band_hash"))
    val oldCand = a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    // alias form: identical children -> exchange reuse
    val newCand = banded.as("ba").join(banded.as("bb"),
        col("ba.band") === col("bb.band") &&
          col("ba.band_hash") === col("bb.band_hash") &&
          col(s"ba.$id") < col(s"bb.$id"))
      .select(col(s"ba.$id").as("id_a"), col(s"bb.$id").as("id_b")).distinct()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"REUSE $name%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (r <- 1 to 3) { t(s"old_$r")(oldCand.count()); t(s"new_$r")(newCand.count()) }
    println("new plan contains ReusedExchange: " +
      newCand.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    println("old plan contains ReusedExchange: " +
      oldCand.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    spark.stop()
  }
}

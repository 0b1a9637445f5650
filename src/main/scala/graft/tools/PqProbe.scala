package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Lake}
import graft.operators.Similarity

/** One-off: distribution of PQ reconstruction cosine at the s11
  * defaults, to pin the query's in-plan gate. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("pq-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Lake(spark, sfDir).embeddings
    for (m <- Seq(4, 2, 1)) {
      try {
        val pq = Similarity.pqReconstruction(emb, "vec_id", "embedding",
          m = m, planes = 4, kmeansIters = 2)
        val r = pq.agg(count(lit(1)), avg("recon_cos"),
          min("recon_cos"), max("recon_cos")).head()
        println(s"PQ m=$m n=${r.getLong(0)} avg=${r.getDouble(1)} min=${r.getDouble(2)} max=${r.getDouble(3)}")
      } catch { case e: Throwable =>
        println(s"PQ m=$m FAILED: ${e.getMessage.take(150)}")
      }
    }
    spark.stop()
  }
}

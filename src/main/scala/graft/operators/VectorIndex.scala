package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{cosine, cosineHof}

/** Persisted IVF index: the build-once / probe-many split a production
  * ANN service runs, separated from [[Similarity.ivfTopK]]'s inline
  * train-and-query (which re-trains per call — right for one-shot
  * analytics, wrong for a 100 TB corpus serving many query batches).
  *
  * `build` trains the quantizer ([[Similarity.trainCells]]) and lands two
  * tables under `dir`:
  *   - `cells/`    — (neighbor_id, c_vec) PARTITIONED BY bucket
  *   - `centroids/` — (bucket, centroid), at most 2^planes rows
  *
  * The bucket partitioning is the scale design: `query` joins the cell
  * table on `bucket` against a broadcast probe list, so Spark's dynamic
  * partition pruning reads ONLY the probed buckets' directories —
  * querying touches nProbe/2^planes of the corpus bytes, not all of
  * them. (VectorIndexSpec pins the pruning in the plan.) Re-probing with
  * different nProbe/k re-reads the index, never re-trains it.
  */
object VectorIndex {

  /** Train and persist the index. Deterministic for `kmeansIters = 0`
    * (LSH-hyperplane cells — the portable mode the s14 gate replays);
    * trained cells (`kmeansIters > 0`) trade that for occupancy balance. */
  def build(corpus: DataFrame, dir: String, idCol: String, vecCol: String,
            planes: Int = 4, kmeansIters: Int = 0): Unit = {
    val (cells, centroids) =
      Similarity.trainCells(corpus, idCol, vecCol, planes, kmeansIters)
    cells.select(col("neighbor_id"), col("c_vec"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/cells")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Top-k cosine neighbors for each query row, served from the
    * persisted index: rank centroids per query (tiny broadcast), probe
    * the `nProbe` best buckets, exact-rank within the probed cells.
    * Same output contract as [[Similarity.ivfTopK]]:
    * (query_id, rank, neighbor_id, sim). */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int,
            nProbe: Int = 2): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val cells = spark.read.parquet(s"$dir/cells")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(desc("c_sim"), asc("bucket"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim", cosineHof(
        transform(col("q_vec"), x => x.cast("double")), col("centroid")))
      .withColumn("c_rank", row_number().over(wProbe))
      .where(col("c_rank") <= nProbe)
      .select("query_id", "q_vec", "bucket")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    cells.join(broadcast(probes), "bucket")
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}

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
    * trained cells (`kmeansIters > 0`) trade that for occupancy balance.
    * `meta` records the assignment rule so [[append]] can route new
    * vectors without retraining. */
  def build(corpus: DataFrame, dir: String, idCol: String, vecCol: String,
            planes: Int = 4, kmeansIters: Int = 0): Unit = {
    val (cells, centroids) =
      Similarity.trainCells(corpus, idCol, vecCol, planes, kmeansIters)
    cells.select(col("neighbor_id"), col("c_vec"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/cells")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((planes, kmeansIters > 0)).toDF("planes", "trained")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Incremental index maintenance: route new vectors into the EXISTING
    * cells — the quantizer is not retrained, so the index absorbs a
    * delta batch at delta cost: assign + one partitioned append (only
    * touched buckets gain files) + a centroid refresh over the touched
    * buckets' cells (bounded by their occupancy, never the index size).
    * LSH mode re-derives the same deterministic hash assignment `build`
    * used, so an append-grown index holds cell-for-cell the data of a
    * from-scratch build (VectorIndexSpec pins this with full-probe
    * query equality); trained mode assigns to the nearest stored
    * centroid — the standard IVF insert, with the known drift caveat
    * that heavy growth eventually wants a re-[[build]] (centroids
    * follow their cells here, but the PARTITION of space is frozen). */
  def append(newVecs: DataFrame, dir: String, idCol: String, vecCol: String): Unit = {
    val spark = newVecs.sparkSession
    val meta = spark.read.parquet(s"$dir/meta").head()
    val planes = meta.getAs[Int]("planes")
    val trained = meta.getAs[Boolean]("trained")
    val v = newVecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val assigned =
      if (!trained)
        v.withColumn("bucket",
          graft.functions.VectorFunctions.lshBucket(col("c_vec"), planes))
      else {
        // nearest stored centroid by cosine; broadcast (≤2^planes rows),
        // one map-side-combined argmax — no window, no fan-out kept
        val cents = spark.read.parquet(s"$dir/centroids")
        v.crossJoin(broadcast(cents))
          .withColumn("__sim", cosineHof(
            transform(col("c_vec"), x => x.cast("double")), col("centroid")))
          .groupBy("neighbor_id")
          .agg(first(col("c_vec")).as("c_vec"),
            max_by(col("bucket"), struct(col("__sim"), -col("bucket")))
              .as("bucket"))
      }
    assigned.select(col("neighbor_id"), col("c_vec"), col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/cells")
    // Touched-bucket centroid refresh: recompute means from the merged
    // cells so probe ranking tracks what the buckets now hold. The
    // touched-bucket list is ≤2^planes ids on the driver; untouched
    // centroid rows pass through unchanged.
    val touched = assigned.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.nonEmpty) {
      val cells = spark.read.parquet(s"$dir/cells")
        .where(col("bucket").isin(touched: _*))
      val dim = cells.select(size(col("c_vec"))).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(0)
      val fresh = Similarity.meanVectorsWide(
        cells, "bucket", "c_vec", "centroid", dim)
      val kept = spark.read.parquet(s"$dir/centroids")
        .where(!col("bucket").isin(touched: _*))
      // overwrite-while-reading guard (the SnapshotStream convention)
      val merged = kept.unionByName(fresh).localCheckpoint(true)
      merged.write.mode("overwrite").parquet(s"$dir/centroids")
    }
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

package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import graft.operators.VectorIndex

/** Continuous ANN-index maintenance: the streaming face of
  * [[graft.operators.VectorIndex.append]], completing the persisted-state
  * stream family (snapshots, aggregates, sketches, joined views — and now
  * the vector index). Each micro-batch of new embeddings routes into the
  * existing cells at delta cost; the batch id rides the index manifest, so
  * a crash-replayed batch is absorbed EXACTLY ONCE (the same replay guard
  * `SnapshotStream.applyAggBatch` uses) — and a batch that crashes
  * mid-append is invisible by the manifest commit protocol, so the
  * recovery replay starts from a clean, servable index either way.
  *
  * The index must exist ([[VectorIndex.build]]) before the stream starts:
  * continuous ingest extends a trained quantizer, it does not train one.
  * Probes against the index run concurrently with ingest — readers always
  * resolve the newest COMMITTED generation. Schedule
  * [[VectorIndex.compact]] + [[VectorIndex.vacuum]] periodically (e.g.
  * every N batches, as `SnapshotStream.upsertSnapshot(compactEvery)`
  * does) to keep the file count proportional to buckets, not batches.
  */
object IndexStream {

  /** File-source schema for an embeddings feed directory. */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", org.apache.spark.sql.types.IntegerType)))

  /** Unbounded read of an embeddings directory. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(dir)

  /** Maintain the persisted index at `indexDir` from an unbounded
    * embeddings frame. `compactEvery > 0` compacts + vacuums after every
    * Nth batch, bounding file-count growth under continuous ingest. */
  def indexStream(embeddings: DataFrame, indexDir: String,
                  idCol: String, vecCol: String, checkpoint: String,
                  compactEvery: Int = 0): DataStreamWriter[Row] =
    embeddings.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VectorIndex.append(batch, indexDir, idCol, vecCol, batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          VectorIndex.compact(batch.sparkSession, indexDir)
          VectorIndex.vacuum(batch.sparkSession, indexDir, keepLast = 1)
          ()
        }
      }
}

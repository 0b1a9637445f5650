package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.LakeMaintenance

/** Continuous MERGE-INTO: a stream of updates maintained as an
  * always-current key-bucketed Parquet snapshot — the streaming twin of
  * [[LakeMaintenance.mergeUpsert]], with the latest-VERSION-wins
  * resolution of [[LakeMaintenance.mergeLatest]] so the snapshot is
  * arrival-order-invariant: whatever micro-batch interleaving the
  * source delivers (late data, replays, backfills), every key converges
  * to its highest-version row.
  *
  * Each micro-batch touches only the buckets its keys hash into
  * (dynamic partition overwrite), so per-batch work scales with batch
  * size, not snapshot size; checkpointed offsets + the idempotent merge
  * give exactly-once snapshot maintenance across restarts.
  */
object SnapshotStream {

  def upsertSnapshot(updates: DataFrame, path: String, checkpoint: String,
                     keyCols: Seq[String], versionCols: Seq[String],
                     numBuckets: Int = 16): DataStreamWriter[Row] =
    updates.writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LakeMaintenance.upsertIntoSnapshot(
          batch, path, keyCols, versionCols, numBuckets)
      }
}

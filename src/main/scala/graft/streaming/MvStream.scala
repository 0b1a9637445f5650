package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.MaterializedView

/** Continuous materialized-view maintenance: the streaming face of
  * [[MaterializedView.absorb]], completing the persisted-state stream
  * family (snapshots, aggregates, sketches, joined views, the vector
  * index, the skipping manifest — and now the routed view catalog).
  *
  * Each micro-batch's rows are folded into the stored view at
  * |batch| + |groups| cost; the post-absorb fingerprint snapshots the
  * fed base, so [[graft.plans.MaterializedViewRule]] routes queries to
  * the view exactly while the view has caught up with the base — a base
  * that has received files the stream hasn't absorbed yet silently
  * reads direct until the next batch lands (correct in both states, by
  * the rule's freshness gate).
  *
  * Exactly-once: the batch id persists with the definition
  * (`_mvdef.json`, republished each absorb), so a crash-replayed batch
  * is folded ONCE — absorb alone would double-count it. The view must
  * exist ([[MaterializedView.create]] over the feed dir) before the
  * stream starts; a new JVM re-registers it with
  * [[MaterializedView.load]] and resumes from the persisted guard. */
object MvStream {

  /** Maintain registered view `name` from an unbounded frame whose rows
    * are the base's append feed (typically
    * [[ZoneMapStream.readFeed]] over the base directory itself). */
  def maintain(rows: DataFrame, name: String,
               checkpoint: String): DataStreamWriter[Row] =
    rows.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        MaterializedView.absorb(batch.sparkSession, name, batch, batchId)
        ()
      }
}

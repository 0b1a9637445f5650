package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{Dedup, LakeMaintenance}

/** Continuous near-dedup ingestion: the streaming twin of
  * [[Dedup.dedupNearIncremental]]. Documents arriving in micro-batches
  * grow a CANONICAL CORPUS on disk — every batch keeps exactly the
  * incoming documents that are near-duplicates of nothing already
  * canonical and of no surviving earlier batch-mate, so yesterday's
  * corpus never loses rows to today's data (the production contract for
  * continuously growing training lakes; [[CurationStream]] covers the
  * stateless annotate/filter/sample stages and identity-fingerprint
  * dedup, this stream adds the MinHash-LSH near-dup stage against
  * unbounded history).
  *
  * Storage is a DELTA-VERSIONED corpus under
  * [[LakeMaintenance.writeSnapshotVersion]]'s atomic-commit protocol:
  * each version holds ONE batch's survivors tagged `__batch`, so
  * per-batch write cost is survivor-sized, never corpus-sized, and a
  * crash mid-write leaves an uncommitted (invisible) directory.
  *
  * EXACTLY-ONCE without a side ledger: the replay guard is the corpus
  * itself. Micro-batch ids are monotone, every committed version carries
  * its batch id in-band (`__batch`), and [[applyDedupBatch]] refuses a
  * batch id at or below the corpus maximum — so the two crash windows
  * both recover cleanly: (a) crash after version commit but before the
  * checkpoint commit → the replayed batch sees its own id in the corpus
  * and no-ops; (b) crash mid-version-write → the torn directory has no
  * manifest, the replay recomputes against exactly the pre-batch corpus
  * and lands a fresh version ([[LakeMaintenance.vacuumVersions]] clears
  * the orphan). A batch whose documents ALL drop writes nothing and
  * needs no record: replaying it recomputes the same empty survivor set.
  * Incoming ids must be globally unique (the operator's contract);
  * replays of the SAME id arrive only via (a) and are screened.
  *
  * `compactEvery` bounds version-count growth: every Nth batch the live
  * corpus is rewritten as ONE version whose rows keep their original
  * `__batch` tags plus `__full = true`; readers resolve the newest full
  * version and union only the deltas committed after it, so the
  * compacted prefix and its superseded versions (vacuumed, keepLast=1)
  * drop out of every later scan. Crash between the full-version commit
  * and the vacuum is benign — readers already ignore everything below
  * the full version.
  */
object DedupStream {

  /** Near-dup parameters, shared by every batch of one stream. The
    * defaults mirror the gated d6/d8 configuration (16x4 banding fires
    * at j^4 per band; threshold-0.8 recall holds at any corpus size). */
  case class Config(shingleN: Int = 3, numHashes: Int = 64,
                    bands: Int = 16, threshold: Double = 0.8)

  /** Maintain the canonical corpus at `root` from an unbounded document
    * frame (e.g. [[CurationStream.readDocs]]). All incoming columns are
    * preserved on survivors. */
  def dedupStream(docs: DataFrame, root: String, checkpoint: String,
                  id: String, text: String, cfg: Config = Config(),
                  compactEvery: Int = 0): DataStreamWriter[Row] =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDedupBatch(batch, batchId, root, id, text, cfg)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compactCorpus(batch.sparkSession, root)
        ()
      }

  /** One ingest step; public so replays are testable and a batch
    * backfill can feed the same corpus with synthetic batch ids. */
  def applyDedupBatch(batch: DataFrame, batchId: Long, root: String,
                      id: String, text: String,
                      cfg: Config = Config()): Unit = {
    val spark = batch.sparkSession
    val versions = LakeMaintenance.snapshotVersions(spark, root)
    val existing: DataFrame =
      if (versions.isEmpty) batch.select(col(id), col(text)).where(lit(false))
      else {
        val corpus = taggedCorpus(spark, root)
        // replay guard: batch ids are monotone, so one max over the
        // column-pruned __batch scan decides "already absorbed"
        val applied = Option(corpus.agg(max(col("__batch"))).head().get(0))
          .map(_.asInstanceOf[Long])
        if (applied.exists(batchId <= _)) return
        corpus.select(col(id), col(text))
      }
    val survivors = Dedup.dedupNearIncremental(
        existing, batch, id, text,
        cfg.shingleN, cfg.numHashes, cfg.bands, cfg.threshold)
      .withColumn("__batch", lit(batchId))
      .withColumn("__full", lit(false))
    // an all-duplicates batch leaves no version: recomputing its empty
    // survivor set on replay is itself the idempotence guarantee
    if (!survivors.isEmpty) {
      LakeMaintenance.writeSnapshotVersion(survivors, root)
      ()
    }
  }

  /** The canonical corpus as the user sees it (internal tags dropped).
    * Empty-schema-safe only once a first version exists. */
  def canonicalCorpus(spark: SparkSession, root: String): DataFrame =
    taggedCorpus(spark, root).drop("__batch", "__full")

  /** Live corpus with tags: newest full version (if any) plus every
    * delta committed after it. */
  private def taggedCorpus(spark: SparkSession, root: String): DataFrame = {
    val versions = LakeMaintenance.snapshotVersions(spark, root)
    require(versions.nonEmpty, s"no committed corpus versions under $root")
    val all = versions
      .map(v => LakeMaintenance.readSnapshotVersion(spark, root, v)
        .withColumn("__v", lit(v)))
      .reduce(_.unionByName(_))
    // one tiny action over two pruned columns resolves the newest full
    // version; crashed compactions (full committed, vacuum pending)
    // resolve here too, by ignoring everything below the full version
    val maxFull = Option(
      all.where(col("__full")).agg(max(col("__v"))).head().get(0))
      .map(_.asInstanceOf[Long])
    maxFull.fold(all)(f => all.where(col("__v") >= f)).drop("__v")
  }

  /** Rewrite the live corpus as one full version (original `__batch`
    * tags preserved, so the replay guard survives compaction) and retire
    * everything it supersedes. Returns the full version's number.
    *
    * Crash window: a kill between the full-version commit and the vacuum
    * leaves the superseded versions on disk, but readers already resolve
    * the newest full version and ignore everything below it
    * ([[taggedCorpus]]), so the window is reader-invisible; the next
    * compaction's vacuum retires the leftovers. Spec-pinned in
    * StreamingSpec ("compaction crash window"). */
  def compactCorpus(spark: SparkSession, root: String): Long = {
    val v = writeFullVersion(spark, root)
    LakeMaintenance.vacuumVersions(spark, root, keepLast = 1)
    v
  }

  /** First half of [[compactCorpus]] — the full-version commit alone,
    * exposed `private[graft]` so the crash window between it and the
    * vacuum is kill-injectable in specs (the spec runs exactly this
    * production step and then "dies"). */
  private[graft] def writeFullVersion(spark: SparkSession, root: String): Long = {
    val full = taggedCorpus(spark, root).withColumn("__full", lit(true))
    LakeMaintenance.writeSnapshotVersion(full, root)
  }
}

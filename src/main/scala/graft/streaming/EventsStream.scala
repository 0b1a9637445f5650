package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming counterparts of the batch events analytics
  * (SURVEY.md §2b "event/time-series"): the same tumbling-window and
  * dedup semantics, expressed as an unbounded `readStream` so the engine
  * covers both bounded and continuous ingestion of the events feed.
  *
  * The batch `events` Parquet directory doubles as a bounded stream for
  * tests (file-source + `processAllAvailable`); a production deployment
  * points the same transforms at Kafka or a landing directory. State is
  * bounded by watermarks — nothing here grows without bound.
  */
object EventsStream {

  /** Parquet file-source schema for the events feed, current physical
    * generation: `ts` as TIMESTAMP(MICROS) (read as TimestampType under
    * the UTC session). The legacy generation shipped `ts` as epoch-nanos
    * BIGINT — [[readEvents]] detects which one a directory holds. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Unbounded read of an events directory, normalized to the same
    * contract batch [[graft.Lake.events]] serves: `ts` is TimestampType
    * whichever physical generation the directory holds. A streaming
    * source must declare its schema up front, so the generation is
    * sniffed from the directory ONCE (one batch-side footer read) —
    * declaring the wrong one would misread every micro-batch with
    * nothing flagging the mismatch. Integer DIV for the legacy branch,
    * as in the batch adapter (epoch-nanos overflow the double
    * mantissa). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val physicalTs = spark.read.parquet(dir).schema("ts").dataType
    val schema = StructType(eventsSchema.map {
      case f if f.name == "ts" => f.copy(dataType = physicalTs)
      case f => f
    })
    val raw = spark.readStream.schema(schema).parquet(dir)
    val normalized = physicalTs match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
    normalized.withColumn("t", col("ts"))
  }

  /** Tumbling 1-hour counts per event type — streaming twin of the batch
    * q19_hourly_windows; with a 2-hour watermark late events beyond the
    * horizon are dropped and window state is reclaimed. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("t", "2 hours")
      .groupBy(window(col("t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))

  /** Streaming exact dedup on a key within the watermark horizon — the
    * continuous counterpart of Dedup.dedupExact. */
  def dedupByEventId(events: DataFrame): DataFrame =
    events.withWatermark("t", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases joined to error events by the
    * same user within the following 30 minutes. Both sides are
    * watermarked, and the time-interval condition bounds the join state
    * Spark must retain — the canonical funnel/attribution join shape.
    * (The 2-hour watermark mirrors hourlyCounts; state for rows older
    * than watermark + interval is reclaimed.) */
  def purchaseToError(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("t").as("p_t"))
      .withWatermark("p_t", "2 hours")
    val errors = events.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("user_id").as("e_user"), col("t").as("e_t"))
      .withWatermark("e_t", "2 hours")
    purchases.join(errors,
      col("p_user") === col("e_user") &&
        col("e_t") >= col("p_t") &&
        col("e_t") <= col("p_t") + expr("INTERVAL 30 MINUTES"))
      .select("purchase_id", "error_id", "p_user")
  }

  /** LEFT-OUTER stream-stream interval join: every purchase emits —
    * matched rows as they pair up, UNMATCHED purchases (null error
    * columns) once the watermark passes the interval's upper bound and
    * Spark can prove no error can still arrive. This is the capability
    * the inner form cannot express: abandoned-flow / no-error-followed
    * detection, driven entirely by watermark progress (state for both
    * sides is reclaimed on the same bound as the inner join). */
  def purchaseToErrorOuter(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("t").as("p_t"))
      .withWatermark("p_t", "2 hours")
    val errors = events.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("user_id").as("e_user"), col("t").as("e_t"))
      .withWatermark("e_t", "2 hours")
    purchases.join(errors,
      col("p_user") === col("e_user") &&
        col("e_t") >= col("p_t") &&
        col("e_t") <= col("p_t") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select("purchase_id", "error_id", "p_user")
  }

  /** Stream-static enrichment join: each micro-batch of the unbounded
    * feed joins a bounded dimension snapshot (re-read per batch, so dim
    * updates between batches are picked up). Catalyst broadcasts the
    * small static side — the streaming analogue of a star-schema
    * dimension join, with no stream-side state at all (unlike
    * stream-stream joins). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    eventKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      events(eventKey) === dim(dimKey), "left")

  /** Gap sessionization — streaming twin of the batch `q20_sessions`:
    * the same `session_window(30 minutes)` aggregate over an unbounded
    * feed. The watermark closes a session once event time moves 2 hours
    * past it, which both finalizes its output (append mode) and reclaims
    * its state — per-user session state never accumulates unboundedly. */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("t", "2 hours")
      .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Continuous lake loading: every micro-batch lands through DYNAMIC
    * partition overwrite keyed on the event hour — replaying a batch
    * (failure recovery, manual backfill) replaces exactly the partitions
    * it owns instead of appending duplicates. This is the streaming half
    * of [[graft.operators.LakeMaintenance.overwritePartitions]]: the
    * sink stays idempotent as long as batch boundaries respect partition
    * boundaries (here: the file source delivers whole files, and a
    * replayed file recomputes the identical hour partitions). */
  def writeHourlyPartitioned(events: DataFrame, path: String,
                             checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events
      .withColumn("event_hour", date_trunc("hour", col("t")))
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.LakeMaintenance.overwritePartitions(
          batch, path, Seq("event_hour"))
      }

  case class FunnelSt(stage: Int, lastTs: Long)
  case class FunnelAdvance(user_id: Long, stage: Int, t_us: Long)

  /** Streaming funnel state machine via flatMapGroupsWithState — the
    * continuous twin of the batch q35 funnel. Per user, the state is
    * (current stage, timestamp of the event that reached it); a row is
    * emitted ONLY when a user advances (flatMap: 0..n outputs per
    * micro-batch, the shape mapGroupsWithState can't express). Events
    * inside a micro-batch arrive unordered, so each invocation sorts its
    * slice by (t_us, event_id) before folding — cross-batch order is the
    * arrival order, as for any online funnel. Stage rules match the
    * batch query: view from stage 0, then click / purchase each at or
    * after the previous stage's timestamp. */
  def funnelProgress(spark: SparkSession, events: DataFrame): Dataset[FunnelAdvance] = {
    import spark.implicits._
    val stageOf = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"),
        col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelSt, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[FunnelSt]) =>
          var st = state.getOption.getOrElse(FunnelSt(0, Long.MinValue))
          val out = Seq.newBuilder[FunnelAdvance]
          rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, tpe, t, _) =>
            val next = stageOf.getOrElse(tpe, -1)
            if (next == st.stage + 1 && t >= st.lastTs) {
              st = FunnelSt(next, t)
              out += FunnelAdvance(uid, next, t)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful aggregation: running per-user totals via
    * mapGroupsWithState (the escape hatch for state machines SQL can't
    * express). NoTimeout here — with a processing-time timeout the query
    * keeps scheduling timeout batches and `processAllAvailable` never
    * drains on a bounded input; an unbounded deployment with key churn
    * would re-enable it (or move to event-time timeout + watermark) to
    * reclaim abandoned keys. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events; var v = prev.total_value
          rows.foreach { r => n += 1; v += r._2 }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twin of [[graft.operators.Curation]]: documents arriving
  * continuously are annotated, quality-filtered, near-identity-deduped
  * within the watermark horizon, and deterministically sampled — the
  * continuous ingestion edge of a training-data lake.
  *
  * The annotate/filter/sample stages are the SAME pure expressions as the
  * batch pipeline (stateless — trivially streaming-safe). Dedup is the
  * one stateful stage: `dropDuplicatesWithinWatermark` on the content
  * fingerprint keeps the first arrival of each fingerprint and reclaims
  * state beyond the horizon — the streaming analogue of the batch
  * min-id survivor (same survivor CARDINALITY per fingerprint; which
  * duplicate survives depends on arrival order, as any online dedup
  * must). */
object CurationStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("arrival", TimestampType)))

  /** Unbounded read of a documents directory (arrival time defaults to
    * ingestion time when the feed carries none). `sourceOptions` reach
    * the file SOURCE — e.g. `maxFilesPerTrigger`, which is silently
    * ignored if set on the sink's DataStreamWriter instead. */
  def readDocs(spark: SparkSession, dir: String,
               sourceOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(docSchema).options(sourceOptions).parquet(dir)
      .withColumn("arrival", coalesce(col("arrival"), current_timestamp()))

  def curate(docs: DataFrame,
             cfg: graft.operators.Curation.Config =
               graft.operators.Curation.Config(sampleSixteenths = 8)): DataFrame =
    graft.operators.Curation.annotateAndFilter(docs, "text", cfg)
      .withWatermark("arrival", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      // sample on the CONTENT fingerprint, exactly like the batch
      // pipeline: arrival-invariant, so the emitted fp set equals the
      // batch fp set even though WHICH duplicate survives the streaming
      // dedup depends on arrival order (sampling on doc_id would let a
      // fingerprint be kept in batch and dropped here whenever the two
      // pipelines crown different survivors)
      .where(graft.operators.Sampling.hashKeep(col("fp"), cfg.sampleSixteenths))
      .select("doc_id", "lang_pred", "quality", "n_tokens", "fp")

  /** Streaming decontamination alerts — the continuous twin of
    * [[graft.operators.Dedup.decontaminate]]: each arriving document is
    * emitted AT MOST ONCE (within the watermark horizon) when any of its
    * distinct word n-grams hits the static benchmark shingle set.
    *
    * Shape: the benchmark side is static and broadcast (a stream-static
    * equi-join carries zero stream-side join state); the only stateful
    * stage is the per-doc alert dedup, whose state the watermark
    * reclaims. Same shingle normalization as the batch operator, so the
    * alerted doc set equals the batch `contaminated = true` set. */
  def decontamAlerts(docs: DataFrame, benchmark: DataFrame,
                     shingleN: Int = 5): DataFrame = {
    import graft.functions.TextFunctions.shingleSet
    val benchShingles = benchmark
      .select(explode(shingleSet(col("text"), shingleN)).as("s")).distinct()
    docs.withWatermark("arrival", "1 hour")
      .select(col("doc_id"), col("arrival"),
        explode(shingleSet(col("text"), shingleN)).as("s"))
      .join(broadcast(benchShingles), Seq("s"), "left_semi")
      .dropDuplicatesWithinWatermark("doc_id")
      .select("doc_id", "arrival")
  }
}

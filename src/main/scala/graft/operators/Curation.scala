package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** End-to-end training-corpus curation: the composition this engine
  * exists for, as one call —
  *
  *   1. annotate: language ID + quality score + token count (pure
  *      codegen'd per-row expressions);
  *   2. filter: drop unidentifiable or low-quality documents;
  *   3. dedup: exact near-identity on the whitespace-normalized text
  *      (md5 fingerprint), deterministic min-id survivor;
  *   4. sample: deterministic hash membership keyed on the CONTENT
  *      fingerprint, so the curated corpus is reproducible across runs,
  *      engines, partitionings, incremental loads — and invariant to
  *      document-id assignment and arrival order (the same text keeps or
  *      drops no matter which duplicate survived dedup, which is what
  *      lets the streaming twin emit the identical fingerprint set).
  *
  * Every stage is individually DuckDB-oracled (t1/t2/t3, t4, d1, t8);
  * the composed pipeline is oracled as `c1_curation` by composing the
  * same SQL — the whole chain stays cell-exact, not just the parts.
  * Scale shape: one window shuffle (dedup) + narrow maps; the sample
  * predicate is a pure function of the fingerprint column, so it pushes
  * ahead of everything except the annotate stage that derives it.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.5,
      dropUnknownLang: Boolean = true,
      sampleSixteenths: Int = 16)

  /** The stateless annotate + filter stage, shared VERBATIM by the batch
    * pipeline and [[graft.streaming.CurationStream]] (which swaps only
    * the stateful dedup) — one definition, no batch/stream drift. Works
    * on batch and streaming frames alike (pure expressions). */
  def annotateAndFilter(df: DataFrame, textCol: String,
                        cfg: Config = Config()): DataFrame = {
    val text: Column = col(textCol)
    df.withColumn("lang_pred", langId(text))
      .withColumn("quality", qualityScore(text))
      .withColumn("n_tokens", size(tokens(text)).cast("long"))
      .withColumn("fp", fingerprintMd5(text))
      .where(col("quality") >= cfg.minQuality)
      .where(if (cfg.dropUnknownLang) col("lang_pred") =!= "unk" else lit(true))
  }

  /** Curate `df` (needs `idCol` and `textCol`): returns the surviving
    * rows annotated with `lang_pred`, `quality`, `n_tokens`, `fp`. */
  def curate(df: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    val filtered = annotateAndFilter(Parallelism.ensure(df), textCol, cfg)
    val deduped = Dedup.dedupExact(filtered, Seq("fp"), idCol)
    Sampling.hashSample(deduped, "fp", cfg.sampleSixteenths)
  }

  /** Source-level curation verdicts (the URL/domain-filtering stage a web
    * corpus runs before any per-document work): aggregate per-document
    * quality to its source and keep only sources with enough volume AND a
    * high-enough mean quality.
    *
    * Exactness at scale: per-row quality doubles are mapped to the
    * integer domain with `floor(q * 1e6)` BEFORE aggregation — floor of a
    * bit-identical double is deterministic, and BIGINT sums are exact and
    * order-independent, so the verdict never depends on partial-aggregate
    * order (a raw double sum would). The mean-quality gate is the
    * cross-multiplied integer comparison `sum >= ceil(minAvg·1e6)·n` —
    * no division anywhere. One partial+final aggregation, no shuffle
    * beyond the groupBy; verdicts broadcast back as a semi-join filter. */
  def sourceStats(df: DataFrame, sourceCol: String, textCol: String,
                  minDocs: Long = 1L, minAvgQuality: Double = 0.5): DataFrame = {
    val micro = math.ceil(minAvgQuality * 1e6).toLong
    Parallelism.ensure(df)
      .select(col(sourceCol),
        floor(qualityScore(col(textCol)) * 1e6).cast("long").as("q_micro"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("q_micro")).as("sum_q_micro"))
      .withColumn("kept",
        col("n_docs") >= minDocs && col("sum_q_micro") >= col("n_docs") * micro)
  }

  /** Concat-and-chunk sequence packing (the pretraining batch-prep step):
    * within each stratum, documents are laid head-to-tail in id order and
    * cut into fixed `budgetTokens`-token packs; each document reports the
    * pack its first token lands in and its offset inside that pack (docs
    * straddle pack boundaries, exactly like a concatenated token stream
    * chunked for training). Pure integer window arithmetic — one shuffle,
    * parallel across strata: a 100 TB packing run shards by stratum the
    * same way a sharded pretraining writer does (a single GLOBAL ordered
    * cumsum would serialize; the stratum key is the scale lever). */
  def packSequences(df: DataFrame, strataCol: String, idCol: String,
                    textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0)
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    Parallelism.ensure(df)
      .select(col(strataCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start_off DIV $budgetTokens"))
      .withColumn("pack_off", pmod(col("start_off"), lit(budgetTokens)))
  }

  /** Keep only documents from sources [[sourceStats]] accepts — the
    * composed filter (broadcast semi-join on the tiny verdict table). */
  def filterBySource(df: DataFrame, sourceCol: String, textCol: String,
                     minDocs: Long = 1L, minAvgQuality: Double = 0.5): DataFrame =
    df.join(
      broadcast(sourceStats(df, sourceCol, textCol, minDocs, minAvgQuality)
        .where(col("kept")).select(sourceCol)),
      Seq(sourceCol), "left_semi")

  /** Language-balanced curation: the same annotate → filter → dedup
    * chain, but the final sample is stratified per PREDICTED language —
    * the "rebalance the training mix" knob (downsample the dominant
    * language, keep more of the rare ones). `fractions` maps lang_pred →
    * sixteenths kept; languages absent from the map are dropped.
    * Membership stays keyed on the content fingerprint, so the kept fp
    * set remains id- and arrival-invariant per stratum. */
  def curateBalanced(df: DataFrame, idCol: String, textCol: String,
                     fractions: Map[String, Int],
                     cfg: Config = Config()): DataFrame = {
    val filtered = annotateAndFilter(Parallelism.ensure(df), textCol, cfg)
    val deduped = Dedup.dedupExact(filtered, Seq("fp"), idCol)
    Sampling.stratified(deduped, "lang_pred", "fp", fractions)
  }
}

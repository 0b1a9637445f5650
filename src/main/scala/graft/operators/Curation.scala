package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

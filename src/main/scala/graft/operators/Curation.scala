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
  *   4. sample: deterministic hash membership, so the curated corpus is
  *      reproducible across runs, engines, partitionings and
  *      incremental loads.
  *
  * Every stage is individually DuckDB-oracled (t1/t2/t3, t4, d1, t8);
  * the composed pipeline is oracled as `c1_curation` by composing the
  * same SQL — the whole chain stays cell-exact, not just the parts.
  * Scale shape: one window shuffle (dedup) + narrow maps; the sample
  * predicate is a pure function of the id, so it pushes ahead of
  * everything except the dedup that feeds it.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.5,
      dropUnknownLang: Boolean = true,
      sampleSixteenths: Int = 16)

  /** Curate `df` (needs `idCol` and `textCol`): returns the surviving
    * rows annotated with `lang_pred`, `quality`, `n_tokens`, `fp`. */
  def curate(df: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    val id: Column = col(idCol)
    val text: Column = col(textCol)
    val annotated = Parallelism.ensure(df)
      .withColumn("lang_pred", langId(text))
      .withColumn("quality", qualityScore(text))
      .withColumn("n_tokens", size(tokens(text)).cast("long"))
      .withColumn("fp", fingerprintMd5(text))
    val filtered = annotated
      .where(col("quality") >= cfg.minQuality)
      .where(if (cfg.dropUnknownLang) col("lang_pred") =!= "unk" else lit(true))
    val deduped = Dedup.dedupExact(filtered, Seq("fp"), idCol)
    Sampling.hashSample(deduped, idCol, cfg.sampleSixteenths)
  }
}

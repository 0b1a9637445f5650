package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling primitives for training-data curation.
  *
  * [[hashSample]] is the scale-correct default: membership is a pure
  * function of the key (md5 prefix vs a hex threshold), so the sample is
  * reproducible across runs, engines, partitionings and cluster sizes, it
  * composes with incremental loads (a document's fate never changes), and
  * two tables sampled on the same key stay join-consistent. Seeded RNG
  * sampling (`df.sample`) guarantees none of that under re-partitioning.
  *
  * [[stratified]] wraps per-stratum fractions (e.g. language-balanced
  * subsampling) over the same deterministic membership function.
  */
object Sampling {

  /** Uniform-hash membership test: md5 of the key, lexicographic hex
    * compare on the FIRST digit only. `sixteenths` in [0,16]: 2 => keep
    * ~2/16 = 12.5% of keys. Hex digits are uniform under md5 and hex-lex
    * order = numeric order, so the first digit is a portable
    * 1/16-granular threshold. The boundary values are handled explicitly:
    * 0 keeps nothing and 16 keeps everything (16 formats as "10", which
    * would otherwise lex-compare below every multi-digit hash prefix and
    * silently keep only ~1/16). */
  def hashKeep(key: Column, sixteenths: Int): Column = {
    require(sixteenths >= 0 && sixteenths <= 16)
    sixteenths match {
      case 0  => lit(false)
      case 16 => lit(true)
      case s  => substring(md5(key.cast("string").cast("binary")), 1, 1) < lit(f"$s%x")
    }
  }

  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame =
    df.where(hashKeep(col(keyCol), sixteenths))

  /** [[hashKeep]] with a COLUMN-valued threshold (per-row keep
    * fractions, e.g. a per-stratum fraction joined in): the numeric
    * value of the first md5 hex digit(s) compared against the
    * threshold. `granularity` must be a power of 16 (16, 256, 4096 —
    * one, two or three hex digits); `kept` is in [0, granularity].
    * Same membership family as the Int overload (for granularity 16,
    * digit value < s == hex char < "%x"-formatted s). */
  def hashKeepDynamic(key: Column, kept: Column, granularity: Int = 16): Column = {
    val digits = granularity match {
      case 16 => 1; case 256 => 2; case 4096 => 3
      case g => throw new IllegalArgumentException(
        s"granularity must be 16, 256 or 4096, got $g")
    }
    kept >= granularity ||
      (kept > 0 &&
        conv(substring(md5(key.cast("string").cast("binary")), 1, digits), 16, 10)
          .cast("int") < kept)
  }

  /** Per-stratum deterministic sampling: `fractions` maps stratum value ->
    * sixteenths kept; absent strata are dropped. */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 fractions: Map[String, Int]): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, sx)) =>
      acc || (col(stratumCol) === stratum && hashKeep(col(keyCol), sx))
    }
    df.where(keep)
  }
}

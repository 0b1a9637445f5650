package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the task
  * holding that key becomes the straggler (or OOMs). Salting splits each
  * hot key into `salts` sub-keys: the left side picks a deterministic
  * pseudo-random salt per row, the right side replicates each row to all
  * salts, and the join runs on (key, salt) — the hot key's rows now spread
  * over `salts` tasks.
  *
  * AQE's skew-join splitting handles most cases at runtime and should be
  * the first resort; explicit salting remains the tool when the skewed
  * side also aggregates downstream (AQE can't split a skewed aggregation
  * key) or when the plan must be stable. Replication multiplies the right
  * side by `salts` — use with a small-to-medium right side. */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic per-row salt (hash of the whole row) — correctness
    // only requires the right side to cover every salt value
    val lSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)))
    val rSalted = right.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    lSalted.join(rSalted, lSalted(key) === rSalted(key) &&
        lSalted("__salt") === rSalted("__salt"))
      .drop(rSalted(key)).drop("__salt")
  }

  /** [[saltedJoin]] restricted to KNOWN hot keys (optimization r19,
    * guide §2.5 "special-case the hot keys"): non-hot rows keep salt 0
    * on both sides (joined exactly once, no replication), hot left rows
    * spread over `salts` sub-keys and ONLY the hot right rows replicate
    * to cover them. Replication cost drops from |right|·salts rows to
    * |hot|·salts — at 100 TB the difference between salting being free
    * insurance and multiplying the build side 64-fold. Output is
    * multiset-identical to the plain equi-join (law-pinned in SkewSpec):
    * every (l, r) key match pairs under exactly one salt value.
    * `hotKeys` compare against the key's STRING rendering — the form
    * the frequency sketch that discovered them stores. */
  def saltedJoinHot(left: DataFrame, right: DataFrame, key: String,
                    salts: Int, hotKeys: Seq[String]): DataFrame = {
    require(salts > 1, "salts must be > 1")
    require(hotKeys.nonEmpty, "saltedJoinHot needs at least one hot key")
    // The hot test renders each side's key to STRING while the join
    // compares natively: with differently-typed keys a value can satisfy
    // `===` (after implicit coercion) yet render differently (bigint 1
    // vs decimal 1.00) — the right rows would not replicate while hot
    // left rows spread over salts, silently DROPPING matched pairs with
    // salt != 0 (ADVICE r19). Same-type keys make the two comparisons
    // agree; differently-typed callers must cast first (JoinPlanner
    // falls back to full-replication salting, which has no hot test).
    require(left.schema(key).dataType == right.schema(key).dataType,
      s"saltedJoinHot requires same-typed keys, got " +
        s"${left.schema(key).dataType.catalogString} vs " +
        s"${right.schema(key).dataType.catalogString}")
    val isHotL = left(key).cast("string").isin(hotKeys: _*)
    val isHotR = right(key).cast("string").isin(hotKeys: _*)
    val lSalted = left.withColumn("__salt",
      when(isHotL, pmod(xxhash64(
        struct(left.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)))
        .otherwise(lit(0L)))
    val rSalted = right.withColumn("__salt",
      explode(when(isHotR,
        sequence(lit(0L), lit(salts.toLong - 1L)))
        .otherwise(array(lit(0L)))))
    lSalted.join(rSalted, lSalted(key) === rSalted(key) &&
        lSalted("__salt") === rSalted("__salt"))
      .drop(rSalted(key)).drop("__salt")
  }

  /** Salt-count advisor: the q43_skew_stats pre-flight as a reusable
    * decision. Profiles `key`'s load distribution with one tiny
    * two-level aggregate (1-row driver fetch — constant at any scale)
    * and returns the salt count that brings the hottest key's expected
    * per-task load down to `targetRatio` × the mean key load:
    *
    *   - max/mean <= targetRatio → 1 (no skew worth paying replication
    *     for; the caller should run the plain join)
    *   - otherwise → ceil(max / (mean · targetRatio)), clamped to
    *     [2, maxSalts] — replication cost stays bounded even against a
    *     pathological single-key table.
    *
    * The profile side is a parameter: pass the LEFT (probe) side of the
    * intended join, since that is the side saltedJoin spreads. */
  def adviseSalts(probe: DataFrame, key: String, targetRatio: Double = 4.0,
                  maxSalts: Int = 64): Int = {
    require(targetRatio >= 1.0, s"targetRatio must be >= 1, got $targetRatio")
    require(maxSalts > 1, s"maxSalts must be > 1, got $maxSalts")
    val row = probe.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_cnt")).head()
    if (row.isNullAt(2) || row.getLong(0) == 0L) 1 // empty probe: nothing to salt
    else {
      val mean = row.getLong(1).toDouble / row.getLong(0)
      val need = math.ceil(row.getLong(2) / (mean * targetRatio)).toInt
      if (need <= 1) 1 else math.min(need, maxSalts)
    }
  }

  /** Skew-adaptive equi-join: runs [[adviseSalts]] on the probe side and
    * either joins plain (advice = 1) or salts with the advised count.
    * Output is multiset-identical to `left.join(right, key)` either way
    * (column order: left columns then right-minus-key, the saltedJoin
    * shape). The advisor aggregate is one extra job over the probe side
    * only — cheap next to the join it protects, and the price of a plan
    * that cannot straggle on a hot key. */
  def autoSaltedJoin(left: DataFrame, right: DataFrame, key: String,
                     targetRatio: Double = 4.0, maxSalts: Int = 64): DataFrame = {
    val salts = adviseSalts(left, key, targetRatio, maxSalts)
    if (salts <= 1)
      left.join(right, left(key) === right(key)).drop(right(key))
    else saltedJoin(left, right, key, salts)
  }
}

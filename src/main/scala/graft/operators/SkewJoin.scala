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
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong)))
    val rSalted = right.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    lSalted.join(rSalted, lSalted(key) === rSalted(key) &&
        lSalted("__salt") === rSalted("__salt"))
      .drop(rSalted(key)).drop("__salt")
  }
}

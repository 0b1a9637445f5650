package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join without the quadratic cross join: SymSpell-style
  * DELETION-NEIGHBORHOOD blocking. Every string generates itself plus its
  * single-character-deletion variants; two strings within Levenshtein
  * distance 1 always share a variant (equal → the string itself;
  * insert/delete → the shorter string; substitute → both delete the
  * differing position), so an equi-join on the variant finds every true
  * pair, and the exact `levenshtein` filter kills the false candidates
  * (shared variant but distance 2, e.g. transpositions).
  *
  * Scale shape: |s|+1 variants per row, one variant-keyed equi-join
  * (hash-partitioned, never all-pairs), one exact filter — cost is
  * Σ|s| plus the candidate volume, which blocking keys (`blockCols`,
  * e.g. a region/nation column) bound further. The naive alternative the
  * oracle runs (per-block cross join + levenshtein) is block²: fine for
  * verification, fatal at corpus scale.
  */
object FuzzyJoin {

  /** The string plus its one-character-deletion variants, de-duplicated.
    * Empty strings have no deletions — just themselves. */
  def deletionVariants(c: Column): Column =
    array_distinct(
      when(length(c) === 0, array(c)).otherwise(
        concat(array(c),
          transform(sequence(lit(1), length(c)),
            i => concat(c.substr(lit(1), i - lit(1)),
              c.substr(i + lit(1), length(c)))))))

  /** All pairs (id_a < id_b) within Levenshtein distance 1 on `textCol`,
    * optionally restricted to rows agreeing on `blockCols`. Returns
    * (blockCols..., id_a, id_b, lev). */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 blockCols: Seq[String] = Nil): DataFrame = {
    val v = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        explode(deletionVariants(col(textCol))).as("v"): _*)
    val joinCond = (col(s"a.v") === col(s"b.v")) +:
      (col(s"a.$idCol") < col(s"b.$idCol")) +:
      blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
    val cand = v.as("a").join(v.as("b"), joinCond.reduce(_ && _))
      .select((blockCols.map(c => col(s"a.$c")) :+
        col(s"a.$idCol").as("id_a") :+ col(s"b.$idCol").as("id_b")): _*)
      .distinct()
    val txt = df.select(col(idCol), col(textCol))
    cand
      .join(txt.select(col(idCol).as("id_a"), col(textCol).as("t_a")), "id_a")
      .join(txt.select(col(idCol).as("id_b"), col(textCol).as("t_b")), "id_b")
      .withColumn("lev", levenshtein(col("t_a"), col("t_b")))
      .where(col("lev") <= 1)
      .drop("t_a", "t_b")
  }
}

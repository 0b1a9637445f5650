package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-joinable rewrite of `LEFT JOIN ... ON a = x OR b = y`.
  *
  * The reference joins its log stream to the artist dimension with an OR of
  * two equalities (reference `etl.py:147-151`). Catalyst cannot key a hash
  * join on a disjunction, so it plans BroadcastNestedLoopJoin —
  * O(|left| x |right|) comparisons. Harmless on 6,820 x 69 rows;
  * catastrophic at 100 TB (SURVEY.md §4).
  *
  * Rewrite (multiset-equivalent to the OR join, not just "close enough"):
  * for predicates p1..pn,
  *  - branch k = `left INNER JOIN right ON pk AND NOT (p1 OR .. OR p(k-1))`
  *    — each (leftRow, rightRow) pair lands in exactly the branch of its
  *    first satisfied predicate, so no pair is duplicated;
  *  - unmatched = `left ANTI JOIN right ON p1 .. ANTI JOIN right ON pn`
  *    (no right row satisfies any predicate) extended with null right
  *    columns — exactly the left-outer null complement.
  * `NOT pk` is wrapped in `coalesce(pk, false)` so SQL three-valued logic
  * matches the OR semantics (pk unknown counts as not-satisfied).
  *
  * Every branch is a plain equi-join, so Catalyst picks broadcast or
  * shuffled hash / sort-merge per side sizes, AQE included. Cost: n+n scans
  * of `left` instead of 1 nested loop — at scale, n linear scans of a
  * columnar source beat |L| x |R| compares by orders of magnitude; with a
  * broadcastable right side the left table never shuffles at all.
  */
object OrEquiJoin {

  /** `left LEFT OUTER JOIN right ON OR_k (leftCol_k = rightCol_k)`. */
  def leftOrJoin(left: DataFrame, right: DataFrame, preds: (String, String)*): DataFrame = {
    require(preds.nonEmpty, "at least one equality predicate")
    // The null complement is built with withColumn over right-schema names;
    // an overlapping left column would be silently replaced with null.
    // Disjoint schemas are a precondition, not a silent corruption.
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right column sets must be disjoint, overlap: ${overlap.mkString(", ")}")
    def eq(p: (String, String)): Column = left(p._1) === right(p._2)
    def notYet(k: Int): Column =
      not(coalesce(preds.take(k).map(eq).reduce(_ || _), lit(false)))

    val branches = preds.zipWithIndex.map { case (p, k) =>
      val cond = if (k == 0) eq(p) else eq(p) && notYet(k)
      left.join(right, cond, "inner")
    }

    val unmatchedLeft = preds.foldLeft(left)((acc, p) =>
      acc.join(right, acc(p._1) === right(p._2), "left_anti"))
    val nullRight = right.schema.fields.foldLeft(unmatchedLeft)((df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType)))

    (branches :+ nullRight).reduce(_ unionByName _)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed aggregate: per group, keep the k records with
  * the highest score (ties broken by ascending id — fully deterministic).
  *
  * This is the training-pipeline "keep the k best documents per bucket"
  * primitive as a single partial-aggregable pass: each task maintains a
  * k-bounded buffer, partial buffers merge associatively, so the shuffle
  * carries at most k rows per group per task — never the group's full
  * contents. The window-function formulation (`row_number <= k`) shuffles
  * every row of every group; this aggregator is the map-side-combined
  * version of the same answer.
  *
  * Built on the public `Aggregator` API + `functions.udaf`, the
  * user-facing face of Catalyst's typed imperative aggregation.
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def ord(s: Scored): (Double, Long) = (-s.score, s.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.sizeIs >= k && Ordering[(Double, Long)].gteq(ord(a), ord(buf.last))) buf
    else ((buf :+ a).sortBy(ord)).take(k)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sortBy(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r.sortBy(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  /** Column form: `top_k(score, id)` -> array<struct<score,id>>.
    * (udaf flattens the case-class input into one argument per field.) */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k))
    (score: Column, id: Column) => fn(score, id)
  }
}

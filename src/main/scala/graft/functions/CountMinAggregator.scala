package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch as a typed aggregate: a depth×width matrix of
  * counters; each item increments one counter per row (bucket chosen by
  * that row's hash), and a point estimate is the MINIMUM of an item's
  * counters — an overestimate by at most the collision mass, never an
  * underestimate.
  *
  * Scale shape: update and merge are elementwise — commutative and
  * associative — so the sketch partial-aggregates map-side and the
  * shuffle carries one fixed-size array per task, regardless of stream
  * length (the frequency analogue of the HLL distinct-count gate in
  * q22). For a FIXED hash family the final sketch is a pure function of
  * the multiset of items — independent of partitioning and order — so
  * estimates are exactly reproducible.
  *
  * The hash family is the portable md5-digit one (row d of item w
  * buckets by the first 7 hex digits of md5("d:w")), the same trick the
  * d4/d10 oracles use, so an external engine can replay the ENTIRE
  * sketch in SQL — the t17 oracle recomputes every bucket's collision
  * mass and the min exactly.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1)

  override def zero: Array[Long] = Array.ofDim[Long](depth * width)

  override def reduce(buf: Array[Long], w: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.bucket(d, w, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {

  /** Row-d bucket of `item`: first 7 hex digits of md5("d:item") mod
    * width — identical to the Spark `md5`/`conv` expression form and to
    * the DuckDB digit-sum replay, so all three agree digit-for-digit. */
  def bucket(d: Int, item: String, width: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$item".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.substring(0, 7)
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** Column form: `count_min(item)` -> array<bigint> of depth*width. */
  def countMin(depth: Int, width: Int): Column => Column = {
    val fn = udaf(new CountMinAggregator(depth, width), Encoders.STRING)
    (item: Column) => fn(item)
  }
}

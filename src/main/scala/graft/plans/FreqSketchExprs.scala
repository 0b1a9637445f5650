package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketches — the FOURTH canonical
  * mergeable summary, completing the family: HLL = how many distinct
  * ([[graft.operators.Sketches]]), theta = which sets overlap
  * ([[ThetaSketchAgg]]), KLL = how values distribute
  * ([[KllDoublesAgg]]), and here: WHICH items dominate. Implements the
  * Misra–Gries/Space-Saving family via Apache DataSketches
  * `frequencies.ItemsSketch` (already on Spark's classpath), as a
  * native `TypedImperativeAggregate` whose partials cross the shuffle
  * as serialized sketch bytes.
  *
  * Why not `groupBy(item).count.orderBy.limit(k)`? That is the right
  * EXACT plan for one question over one keyspace. The sketch is a
  * few-KB BINARY column: per-day/per-source top-token state persists to
  * the lake next to the HLL/theta/KLL columns, MERGES associatively to
  * any rollup after the fact, and maintains incrementally — "top
  * domains last quarter" becomes a fold over stored sketches instead of
  * a re-scan of a quarter of history.
  *
  * Exactness contract (what the q56 gate leans on): the sketch holds an
  * internal map of `0.75 · maxMapSize` counters; while the number of
  * DISTINCT items in a group stays at or under that, no purge ever
  * happens, `getMaximumError() == 0`, and every estimate is the exact
  * count — deterministic under any partitioning or merge order. Past
  * it, estimates carry error ≤ n/maxMapSize and the frequent-items
  * calls bound it via NO_FALSE_POSITIVES/NEGATIVES (FreqSpec pins the
  * overflow regime). maxMapSize must be a power of 2 (library rule,
  * checked eagerly).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 2 && Integer.bitCount(maxMapSize) == 1,
    s"freq_sketch_agg maxMapSize must be a power of 2, got $maxMapSize")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg expects a string column, got ${t.catalogString}")
  }

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch_agg"
}

/** Merge of pre-built frequency sketches (BINARY column) — the
  * rollup/IVM face, e.g. per-day partials to a quarter. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 2 && Integer.bitCount(maxMapSize) == 1,
    s"freq_merge_agg maxMapSize must be a power of 2, got $maxMapSize")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_merge_agg expects binary sketches, got ${t.catalogString}")
  }

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe()))
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_merge_agg"
}

/** Top-k read off a serialized frequency sketch: array of
  * (item, est) structs, ordered by estimate descending then item
  * ascending (a total order, so exact-mode output is deterministic).
  * NO_FALSE_POSITIVES — in exact mode it returns every item with its
  * exact count; in overflow it under-reports rather than inventing
  * heavy hitters. CodegenFallback: runs on post-aggregation rows only. */
case class FreqTopItems(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"freq_top_items expects (binary, int), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override protected def nullSafeEval(sk: Any, k: Any): Any = {
    val s = ItemsSketch.getInstance(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe())
    val rows = s.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k.asInstanceOf[Int])
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate)
    }.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopItems =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_top_items"
}

/** Column-API entry points for the frequency family. */
object FreqSketchExprs {
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  def freqSketchAgg(c: Column, maxMapSize: Int = 256): Column =
    B.column(FreqSketchAgg(B.expression(c), maxMapSize)
      .toAggregateExpression())
  def freqMergeAgg(c: Column, maxMapSize: Int = 256): Column =
    B.column(FreqMergeAgg(B.expression(c), maxMapSize)
      .toAggregateExpression())
  def freqTopItems(sk: Column, k: Column): Column =
    B.column(FreqTopItems(B.expression(sk), B.expression(k)))
}

package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta distinct sketches (Apache DataSketches, already on Spark's
  * classpath) as native Catalyst aggregates + scalar set operations.
  *
  * Why a second sketch family next to [[graft.operators.Sketches]]'s
  * HLL: HLL state only supports UNION — it answers "how many distinct
  * in A∪B" but cannot say "how many users did BOTH A and B". A theta
  * sketch is a uniform hash SAMPLE of the distinct set, so it supports
  * set ALGEBRA: intersection and difference compose on the sketches
  * themselves, at any scale, without touching rows — the segment-overlap
  * / retention-cohort question at 100 TB. Trade-off: larger state than
  * HLL (up to 8·2^lgK bytes vs 2^lgK) and intersection error grows when
  * the overlap is small relative to the operands.
  *
  * Exactness contract (what the q51 gate leans on): below 2^lgK distinct
  * values a theta sketch retains EVERY distinct hash — estimates of the
  * sketch and of any intersection/difference of such sketches are exact
  * integers, deterministic under any partitioning. Past that threshold
  * estimates carry the usual ~1/sqrt(2^lgK) relative error
  * (ThetaSpec pins a 100k-distinct slab against a 5% budget).
  *
  * The scalar set ops are [[CodegenFallback]] by design: they run on
  * POST-AGGREGATION rows (one per group pair), never in a per-row hot
  * path, so interpreted eval costs nothing measurable while keeping the
  * code one deserialize-combine-serialize expression.
  *
  * The aggregation buffer is a theta `Union` gadget (accepts both raw
  * updates and sketch merges); partials cross the shuffle as compact
  * ordered sketch bytes via serialize/deserialize — the
  * TypedImperativeAggregate contract, same shape Spark's own HLL
  * aggregate uses.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgNomEntries: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | BinaryType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg does not support ${t.catalogString}")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType  => buffer.update(v.asInstanceOf[Array[Byte]])
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_sketch_agg"
}

/** Union of pre-built theta sketches (BINARY column of sketch bytes) —
  * the rollup/merge face, e.g. per-day partials up to a total. */
case class ThetaUnionAgg(
    child: Expression,
    lgNomEntries: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects binary sketches, got ${t.catalogString}")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_union_agg"
}

private object ThetaBytes {
  def sketch(bytes: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(bytes))
}

/** Rounded cardinality estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects binary sketches, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    Math.round(ThetaBytes.sketch(v.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

/** Sketch-level set operations: combine two serialized sketches into the
  * sketch of the intersection / difference of the underlying sets. */
abstract class ThetaSetOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
}

case class ThetaIntersect(left: Expression, right: Expression)
  extends ThetaSetOp with BinaryLike[Expression] {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaBytes.sketch(a.asInstanceOf[Array[Byte]]),
        ThetaBytes.sketch(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_intersect"
}

case class ThetaANotB(left: Expression, right: Expression)
  extends ThetaSetOp with BinaryLike[Expression] {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaBytes.sketch(a.asInstanceOf[Array[Byte]]),
        ThetaBytes.sketch(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_a_not_b"
}

/** Column-API entry points for the theta family. */
object ThetaSketchExprs {
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  def thetaSketchAgg(c: Column, lgNomEntries: Int = 12): Column =
    B.column(ThetaSketchAgg(B.expression(c), lgNomEntries)
      .toAggregateExpression())
  def thetaUnionAgg(c: Column, lgNomEntries: Int = 12): Column =
    B.column(ThetaUnionAgg(B.expression(c), lgNomEntries)
      .toAggregateExpression())
  def thetaEstimate(c: Column): Column =
    B.column(ThetaEstimate(B.expression(c)))
  def thetaIntersect(a: Column, b: Column): Column =
    B.column(ThetaIntersect(B.expression(a), B.expression(b)))
  def thetaANotB(a: Column, b: Column): Column =
    B.column(ThetaANotB(B.expression(a), B.expression(b)))
}

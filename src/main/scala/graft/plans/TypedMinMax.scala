package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MIN/MAX over strings as [[TypedImperativeAggregate]]s — result- and
  * null-identical to Spark's `Min`/`Max`, but plannable by
  * ObjectHashAggregateExec (guide §4, VERDICT r19 item 6).
  *
  * Why: `Min(string)` is a DeclarativeAggregate whose buffer holds an
  * immutable UTF8String, which HashAggregateExec's fixed-width mutable
  * UnsafeRow cannot store — so ANY aggregate list containing one falls
  * back to SortAggregate, paying a full Sort of the input on BOTH sides
  * of the exchange (the q86/q89-class OR-join gates ran 2 SortAggregate
  * + 3 Sort per pre-aggregation). A TypedImperativeAggregate holds its
  * buffer as a JVM object, so the same aggregate plans as
  * ObjectHashAggregate — hash-based, no sorts — and mixes freely with
  * declarative Sum/Count in one list.
  *
  * Semantics matched to `Min`/`Max` exactly:
  *  - nulls are ignored; the result is null iff no non-null input;
  *  - ordering is UTF8String's byte-wise comparison — the interpreted
  *    ordering Spark uses for the default (UTF8_BINARY) StringType,
  *    which is the ONLY type the OR-join rule substitutes these for
  *    (collated string types keep the stock declarative path);
  *  - ties keep either operand (equal byte sequences are equal values).
  *
  * The adopted value is cloned: the UTF8String handed to `update` may
  * point into a reused scan/row buffer, and the aggregate retains it
  * across rows. Serialization marks null with a 0-length-free leading
  * byte so an empty-string minimum round-trips distinctly from "no
  * input yet". Law-pinned against Min/Max in OrEquiJoinRuleSpec.
  */
abstract class TypedMinMaxBase
  extends TypedImperativeAggregate[UTF8String] with UnaryLike[Expression] {

  /** True when `candidate` should replace `current` (both non-null). */
  protected def beats(candidate: UTF8String, current: UTF8String): Boolean

  override def createAggregationBuffer(): UTF8String = null

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the default string type, got ${t.catalogString}")
  }

  final override def update(buffer: UTF8String, input: InternalRow): UTF8String = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val u = v.asInstanceOf[UTF8String]
      if (buffer == null || beats(u, buffer)) u.clone() else buffer
    }
  }

  final override def merge(buffer: UTF8String, other: UTF8String): UTF8String =
    if (other == null) buffer
    else if (buffer == null || beats(other, buffer)) other
    else buffer

  final override def eval(buffer: UTF8String): Any = buffer

  final override def serialize(buffer: UTF8String): Array[Byte] =
    if (buffer == null) Array[Byte](0)
    else {
      val b = buffer.getBytes
      val out = new Array[Byte](b.length + 1)
      out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length)
      out
    }

  final override def deserialize(bytes: Array[Byte]): UTF8String =
    if (bytes.isEmpty || bytes(0) == 0) null
    else UTF8String.fromBytes(bytes, 1, bytes.length - 1)

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
}

case class TypedMin(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedMinMaxBase {
  override protected def beats(c: UTF8String, cur: UTF8String): Boolean =
    c.compareTo(cur) < 0
  override def withNewMutableAggBufferOffset(newOffset: Int): TypedMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TypedMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TypedMin =
    copy(child = newChild)
  override def prettyName: String = "typed_min"
}

case class TypedMax(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedMinMaxBase {
  override protected def beats(c: UTF8String, cur: UTF8String): Boolean =
    c.compareTo(cur) > 0
  override def withNewMutableAggBufferOffset(newOffset: Int): TypedMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TypedMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TypedMax =
    copy(child = newChild)
  override def prettyName: String = "typed_max"
}

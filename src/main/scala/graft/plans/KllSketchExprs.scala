package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** KLL quantile sketches (Apache DataSketches) as native Catalyst
  * aggregates — MERGEABLE percentiles, completing the sketch trio
  * (distinct: [[graft.operators.Sketches]] HLL; set algebra:
  * [[ThetaSketchAgg]]; distributions: here).
  *
  * Why it matters at 100 TB: `percentile` is exact but holistic (sorts
  * the group); `percentile_approx` answers once but its state is not a
  * column you can store. A KLL sketch is a few-KB BINARY column with an
  * a-priori rank-error bound (~1.65% at the default k=200, 99%
  * confidence), and sketches MERGE — so per-day/per-shard latency
  * distributions persist to the lake, roll up to any window after the
  * fact, and maintain incrementally exactly like the HLL/theta tables
  * (same parquet + union IVM shape; merge is associative and, like HLL,
  * insensitive to how history was batched up to the error bound).
  *
  * Determinism caveat, stated loudly: KLL COMPACTION IS RANDOMIZED
  * (unbiased coin-flip offsets), so past ~k retained values two builds
  * over the same data may return slightly different quantiles — all
  * within the rank-error bound. Gates therefore check RANK ERROR, not
  * byte equality (q52's booleans; KllSpec's budgets); below k values
  * nothing has compacted and answers are exact order statistics.
  *
  * Quantile convention: INCLUSIVE search criteria — `kll_quantile(sk,q)`
  * is the smallest retained value whose inclusive rank (fraction of
  * values <= it) reaches q; `kll_rank(sk, v)` is the inclusive rank of
  * v. The scalar readers are [[CodegenFallback]]: they run on
  * post-aggregation rows, never per input row.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_agg expects a numeric column, got ${t.catalogString}")
  }

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case FloatType   => buffer.update(v.asInstanceOf[Float].toDouble)
      case LongType    => buffer.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_agg"
}

/** Merge of pre-built KLL sketches (BINARY column) — the rollup face. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects binary sketches, got ${t.catalogString}")
  }

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_agg"
}

private object KllBytes {
  def sketch(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Inclusive-rank quantile read off a serialized KLL sketch. Null for an
  * empty sketch (a quantile of nothing is undefined, not NaN). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects (binary, double), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val s = KllBytes.sketch(sk.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_quantile"
}

/** Inclusive rank of a value in a serialized KLL sketch. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_rank expects (binary, double), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override protected def nullSafeEval(sk: Any, v: Any): Any = {
    val s = KllBytes.sketch(sk.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getRank(v.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_rank"
}

/** Column-API entry points for the KLL family. */
object KllSketchExprs {
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  def kllAgg(c: Column, k: Int = 200): Column =
    B.column(KllDoublesAgg(B.expression(c), k).toAggregateExpression())
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    B.column(KllMergeAgg(B.expression(c), k).toAggregateExpression())
  def kllQuantile(sk: Column, q: Column): Column =
    B.column(KllQuantile(B.expression(sk), B.expression(q)))
  def kllRank(sk: Column, v: Column): Column =
    B.column(KllRank(B.expression(sk), B.expression(v)))
}

package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `array<float>` (or `array<double>`)
  * columns as a native Catalyst expression with whole-stage codegen.
  *
  * The composable alternative — `aggregate(zip_with(a,b,_*_),0d,_+_) /
  * (sqrt(...) * sqrt(...))` — builds three intermediate arrays and walks
  * the vectors five times through interpreted higher-order-function
  * lambdas. This expression is one tight loop over the raw float arrays
  * (dot product and both norms accumulated together), generated inline
  * into the enclosing WholeStageCodegen stage — the difference between a
  * similarity scan being compute-bound or allocation-bound at 100 TB.
  *
  * Accumulation is element-to-double left-to-right, the same order as the
  * HOF formulation with explicit double casts, so results are bit-equal
  * to the composable form (see VectorFunctions.cosineHof).
  *
  * Input typing: each side must be `array<float>` or `array<double>`
  * (mixed widths allowed — e.g. a raw embedding against a
  * `transform`-normalized double vector); anything else is an analysis
  * error, not a silent misread of the unsafe array slots.
  *
  * Null behavior: null if either array is null; 0.0 for zero-norm inputs
  * (instead of NaN) so downstream top-k ordering stays total.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementType(left).isDefined && elementType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires array<float> or array<double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  @inline private def get(a: ArrayData, i: Int, et: DataType): Double =
    if (et == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  // fixed at analysis time — hoisted so interpreted eval pays no per-row
  // dataType pattern-match/Option allocation
  @transient private lazy val ltype: DataType = elementType(left).get
  @transient private lazy val rtype: DataType = elementType(right).get

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, i, ltype)
      val yi = get(y, i, rtype)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      def getter(v: String, et: DataType): String =
        if (et == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val gx = getter(a, elementType(left).get)
      val gy = getter(b, elementType(right).get)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $gx;
         |  double $yi = $gy;
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column-API entry point: `cosine(embA, embB)`. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarityExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

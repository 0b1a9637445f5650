package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence statistics over a string array as ONE native hash pass:
  * `struct(mx, dup)` — the count of the most frequent element and the
  * total count of elements whose value occurs more than once (the two
  * Gopher-style repetition counters).
  *
  * The composable alternative (TextFunctions.runStats' original form) is
  * `aggregate(array_sort(arr), struct-acc, fold)`: higher-order functions
  * evaluate their lambda INTERPRETED per element — each step allocates a
  * GenericInternalRow accumulator and walks a when-chain through the
  * expression interpreter — and array_sort pays an O(n log n) comparator
  * pass whose ORDER the counters never needed (any grouping of equal
  * values yields the same mx/dup). One open-addressing-style hash count
  * in compiled code is O(n), allocation-light, and inlines into the
  * enclosing WholeStageCodegen stage via a static call (the
  * [[CosineSimilarityExpr]] playbook). Measured on the sf0.1 documents
  * corpus this moved t15_repetition from ~1.2 s to well inside its
  * historical band.
  *
  * Semantics are pinned to the fold it replaces (OperatorLawsSpec +
  * the t6/t15 oracle gates): equal strings group by value equality;
  * NULL elements never group (each is its own run of 1 — `null === x`
  * is never true in the fold), so they can raise mx to 1 but never
  * count as duplicated; an empty array is (0, 0).
  */
case class RunStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RunStats.outType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"run_stats requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RunStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RunStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunStatsExpr {
  /** Column-API entry point: `runStats(arr)` → struct(mx, dup). */
  def runStats(arr: Column): Column =
    GraftColumnBridge.column(RunStatsExpr(GraftColumnBridge.expression(arr)))
}

/** Static helper in its own object (no companion class) so the generated
  * Java code can call it through Scala's static forwarder. */
object RunStats {
  val outType: StructType = StructType(Seq(
    StructField("mx", IntegerType, nullable = false),
    StructField("dup", IntegerType, nullable = false)))

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var mx = 0
    var dup = 0
    if (n > 0) {
      // keys are UTF8String views into the (stable-for-this-eval) array
      // bytes — the map never outlives the call, so no copies needed
      val counts = new java.util.HashMap[UTF8String, Array[Int]](
        math.min(n * 2, 1 << 16))
      var sawNull = false
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) sawNull = true
        else {
          val s = arr.getUTF8String(i)
          val c = counts.get(s)
          if (c == null) counts.put(s, Array(1)) else c(0) += 1
        }
        i += 1
      }
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > mx) mx = c
        if (c > 1) dup += c
      }
      if (sawNull && mx < 1) mx = 1
    }
    new GenericInternalRow(Array[Any](mx, dup))
  }
}

package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Contiguous word n-gram shingles over a token array as one compiled
  * pass: element i = tokens[i..i+n-1] space-joined; empty array when the
  * input has fewer than n tokens OR is null (the `when(size >= n, …)
  * .otherwise(array())` contract of the HOF form it replaces — a null
  * condition falls through to the empty-array branch, so this expression
  * is never null).
  *
  * The composable form — `transform(sequence(…), i => concat_ws(" ",
  * slice(toks, i, n)))` — evaluates its lambda INTERPRETED per shingle
  * and allocates a slice array plus an Integer box per element; shingling
  * sits under every near-dup signature and repetition score in the
  * engine, so it is scan-path-hot. One static call keeps the enclosing
  * WholeStageCodegen stage intact (the [[CosineSimilarityExpr]]
  * playbook).
  *
  * Null TOKENS inside the array are skipped by the join exactly as
  * `concat_ws` skips them (tokenizers here never produce null tokens;
  * the case exists only for semantic parity). */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleUtil.emptyArray
    else ShingleUtil.shingles(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = ${childGen.isNull}
          ? graft.plans.ShingleUtil.emptyArray()
          : graft.plans.ShingleUtil.shingles(${childGen.value}, $n);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {
  /** Column-API entry point over a TOKEN ARRAY column. */
  def shingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShinglesExpr(GraftColumnBridge.expression(tokens), n))
}

/** Static helpers in their own object (no companion class) so generated
  * Java calls them through Scala's static forwarders. */
object ShingleUtil {
  private val empty = new GenericArrayData(Array.empty[Any])

  def emptyArray: GenericArrayData = empty

  private val space = UTF8String.fromString(" ")

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return empty
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      if (n == 1) {
        // single-token shingle: concat_ws of one part (null -> "")
        val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        out(i) = UTF8String.concatWs(space, t)
      } else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) =
            if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(space, parts: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

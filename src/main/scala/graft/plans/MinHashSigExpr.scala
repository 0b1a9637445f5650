package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash signature over a TOKEN ARRAY as one compiled pass:
  * `struct(signature: array<long>, n_shingles: long)` — for each of
  * `numHashes` seeds, the minimum seeded hash over the row's DISTINCT
  * word n-gram shingles, plus the distinct-shingle count. NULL when the
  * row has no shingles (fewer than `n` tokens, or a null token array) —
  * the same rows the aggregate form drops by producing no postings.
  *
  * The composable form ([[graft.operators.Dedup.minHashSignatures]]'s
  * original shape) is `explode(shingles) -> per-posting hash ->
  * groupBy(id).agg(min x numHashes)`: every shingle becomes an input ROW
  * to a hash aggregate with `numHashes` min buffers, paying row
  * materialization, buffer updates, and (for the portable md5 family) a
  * hex-string digest plus `conv`/`substring` string parsing per posting.
  * This expression computes the whole signature inside the scan's
  * WholeStageCodegen stage via one static call (the [[RunStatsExpr]] /
  * [[WordShinglesExpr]] playbook): shingle -> dedupe (hash set) -> one
  * string hash -> `numHashes` integer mixes -> min, no explode and no
  * per-shingle aggregation machinery. The id-level groupBy that remains
  * in the operator merges per-row structs (elementwise min / count sum),
  * which is one input row per document instead of one per shingle.
  *
  * Hash parity is bit-exact with the Column forms it replaces:
  *  - Xx family: `xxhash64(shingle)` = [[XXH64.hashUTF8String]] at seed
  *    42, and `xxhash64(base, lit(j))` chains
  *    `hashInt(j, hashLong(base, 42))` — replayed here with the same
  *    static methods Spark's codegen emits.
  *  - Md5 family (Kirsch–Mitzenmacher): h1/h2 are the first 15 / next 14
  *    hex nibbles of the md5 digest, read directly from the digest bytes
  *    (no hex-string round trip), and seed j's value is
  *    `floorMod(h1 + j*h2, 2^60)` = `pmod`. Java arithmetic wraps where
  *    ANSI `+`/`*` would raise on overflow, but overflow is unreachable
  *    at the engine's seed counts: h1 < 2^60 and h2 < 2^56, so
  *    h1 + j*h2 < 2^56·(16 + j) stays under 2^63 exactly while
  *    j <= 112 — hence the numHashes <= 113 cap here and in the
  *    operator, keeping the ANSI aggregate form bit-identical.
  *
  * Semantics pinned by OperatorLawsSpec (native ≡ aggregate form, both
  * families, including duplicate ids, duplicate texts, null/empty/short
  * docs) and by the d2/d6/d8 oracle gates.
  */
case class MinHashSigExpr(child: Expression, n: Int, numHashes: Int,
                          md5Family: Boolean) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  require(numHashes >= 1, "numHashes must be >= 1")
  require(!md5Family || numHashes <= 113,
    "Md5 family overflow headroom caps seeds at 113 (j <= 112 keeps " +
      "h1 + j*h2 below 2^63 given h1 < 2^60, h2 < 2^56)")

  override def dataType: DataType = MinHashUtil.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashUtil.sig(v.asInstanceOf[ArrayData], n, numHashes, md5Family)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val rowType = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $rowType ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.plans.MinHashUtil.sig(
          ${childGen.value}, $n, $numHashes, $md5Family);
        ${ev.isNull} = ${ev.value} == null;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Column-API entry point over a TOKEN ARRAY column. */
  def sig(tokens: Column, n: Int, numHashes: Int, md5Family: Boolean): Column =
    GraftColumnBridge.column(MinHashSigExpr(
      GraftColumnBridge.expression(tokens), n, numHashes, md5Family))
}

/** Static helpers in their own object (no companion class) so generated
  * Java calls them through Scala's static forwarders. */
object MinHashUtil {
  val outType: StructType = StructType(Seq(
    StructField("signature", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n_shingles", LongType, nullable = false)))

  /** MessageDigest is stateful; codegen calls this from every task thread. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Mod60 = 1L << 60

  def sig(toks: ArrayData, n: Int, numHashes: Int, md5: Boolean): InternalRow = {
    val sh = ShingleUtil.shingles(toks, n)
    val m = sh.numElements()
    if (m == 0) return null
    // dedupe on string value — UTF8String equality is bytewise, exactly
    // array_distinct's comparison; views into this eval's bytes are safe
    // because the set never outlives the call
    val seen = new java.util.HashSet[UTF8String](Integer.highestOneBit(m) * 4)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var distinct = 0L
    var i = 0
    while (i < m) {
      val s = sh.getUTF8String(i)
      if (seen.add(s)) {
        distinct += 1
        if (md5) {
          val dg = md5Local.get()
          dg.reset()
          val d = dg.digest(s.getBytes)
          var h1 = 0L
          var k = 0
          while (k < 15) { h1 = (h1 << 4) | nibble(d, k); k += 1 }
          var h2 = 0L
          k = 15
          while (k < 29) { h2 = (h2 << 4) | nibble(d, k); k += 1 }
          var j = 0
          while (j < numHashes) {
            val v = java.lang.Math.floorMod(h1 + j.toLong * h2, Mod60)
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        } else {
          val base = XXH64.hashUTF8String(s, 42L)
          val inner = XXH64.hashLong(base, 42L)
          var j = 0
          while (j < numHashes) {
            val v = XXH64.hashInt(j, inner)
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(mins), distinct))
  }

  /** Hex nibble `idx` (0-based, high nibble first) of the digest. */
  private def nibble(d: Array[Byte], idx: Int): Long = {
    val b = d(idx >> 1) & 0xff
    (if ((idx & 1) == 0) b >>> 4 else b & 0xf).toLong
  }
}

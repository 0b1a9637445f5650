package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.plans.CosineSimilarityExpr

/** Embedding-vector primitives over `array<float>` columns.
  *
  * Two implementations of cosine similarity:
  *  - [[cosine]]: the fused native expression ([[CosineSimilarityExpr]],
  *    codegen, one pass) — the production path;
  *  - [[cosineHof]]: built-in higher-order functions only — the readable
  *    reference implementation and test oracle for the custom expression.
  * Both accumulate float->double left-to-right, so they agree bit-exactly.
  */
object VectorFunctions {

  /** Dot product via zip_with + aggregate (double accumulation). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm via HOFs. */
  def normHof(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity composed from built-ins (reference path). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = normHof(a) * normHof(b)
    when(denom === 0.0, 0.0).otherwise(dotHof(a, b) / denom)
  }

  /** Cosine similarity, fused codegen expression (production path). */
  def cosine(a: Column, b: Column): Column = CosineSimilarityExpr.cosine(a, b)

  /** Scalar min-max quantization of a float vector to [0, 255] integer
    * codes plus the (lo, hi) dequantization range — the 4x storage
    * compression an embedding lake actually applies at rest. `floor` is
    * used instead of `round`: floor is deterministic across engines
    * while half-way rounding ties are not, and the codes stay exact
    * (x = hi maps to exactly 255 — the ratio is computed from the same
    * doubles, so no clamp is needed). A constant vector (hi == lo)
    * quantizes to all-zero codes. */
  def quantizeUint8(v: Column): Column = {
    val lo = array_min(v).cast(DoubleType)
    val hi = array_max(v).cast(DoubleType)
    val codes = transform(v, x =>
      when(hi > lo,
        floor((x.cast(DoubleType) - lo) / (hi - lo) * 255).cast("int"))
        .otherwise(lit(0)))
    struct(lo.as("lo"), hi.as("hi"), codes.as("codes"))
  }

  /** Dequantize [[quantizeUint8]] output back to doubles (midpoint-free
    * linear reconstruction: code/255 * (hi-lo) + lo). */
  def dequantizeUint8(q: Column): Column =
    transform(q.getField("codes"), c =>
      q.getField("lo") + c.cast(DoubleType) / 255.0 *
        (q.getField("hi") - q.getField("lo")))

  /** Deterministic random projection to `outDims` dimensions with the
    * Achlioptas ±1 coefficient family (the storage/JL dimension-reduction
    * step of an embedding lake). The sign for (output dim j, input dim i)
    * is md5("j:i")'s first hex digit >= '8' — no stored matrix, any
    * worker (or engine: the s7 DuckDB oracle replays it) regenerates the
    * coefficients on the fly. Accumulation is float→double left-to-right,
    * the same portable fold the cosine helpers use. */
  def randomProjectMd5(v: Column, outDims: Int): Column = {
    require(outDims >= 1)
    transform(sequence(lit(0), lit(outDims - 1)), j =>
      aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast(DoubleType) *
            when(substring(md5(concat(j.cast("string"), lit(":"),
              i.cast("string"))), 1, 1) >= "8", lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, p) => acc + p))
  }

  /** Sign bit of the projection of `v` onto a deterministic pseudo-random
    * hyperplane (plane index + dimension index seed xxhash64, mapped to
    * [-1, 1)). The reference implementation of one [[lshBucket]] bit —
    * kept as the law-spec oracle for the fused kernel. */
  def hyperplaneBit(v: Column, plane: Int): Column = {
    // coefficient for dim i: xxhash64(i, plane) scaled to [-1, 1)
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast(DoubleType) *
          (xxhash64(i, lit(plane)).cast(DoubleType) / lit(Long.MaxValue.toDouble))),
      lit(0.0), (acc, p) => acc + p)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits composed from
    * [[hyperplaneBit]] — one interpreted zip_with/fold pass per plane.
    * Reference path and law-spec oracle for [[lshBucket]]. */
  def lshBucketHof(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    if (nPlanes == 0) lit(0)
    else (0 until nPlanes).map(p => hyperplaneBit(v, planeOffset + p) * lit(1 << p))
      .reduce(_ + _)

  /** LSH bucket id from `nPlanes` hyperplane sign bits (0 planes = the
    * degenerate single bucket, i.e. exact all-pairs mode). `planeOffset`
    * selects a disjoint hyperplane family — offset t*nPlanes gives the
    * t-th independent hash table for multi-table banding.
    *
    * Fused codegen kernel ([[graft.plans.LshBucketExpr]]): all planes in
    * one pass over the raw array, bit-identical to [[lshBucketHof]]
    * (VectorKernelSpec pins it) — the HOF form paid one interpreted
    * per-element lambda eval per plane per row. */
  def lshBucket(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    graft.plans.VectorKernelExprs.lshBucket(v, nPlanes, planeOffset)
}

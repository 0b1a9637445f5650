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

  /** Sign bit of the projection of `v` onto a deterministic pseudo-random
    * hyperplane (plane index + dimension index seed xxhash64, mapped to
    * [-1, 1)). Used for LSH bucketing of embeddings — no stored plane
    * matrix, any worker regenerates coefficients on the fly. */
  def hyperplaneBit(v: Column, plane: Int): Column = {
    // coefficient for dim i: xxhash64(i, plane) scaled to [-1, 1)
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast(DoubleType) *
          (xxhash64(i, lit(plane)).cast(DoubleType) / lit(Long.MaxValue.toDouble))),
      lit(0.0), (acc, p) => acc + p)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits (0 planes = the
    * degenerate single bucket, i.e. exact all-pairs mode). `planeOffset`
    * selects a disjoint hyperplane family — offset t*nPlanes gives the
    * t-th independent hash table for multi-table banding. */
  def lshBucket(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    if (nPlanes == 0) lit(0)
    else (0 until nPlanes).map(p => hyperplaneBit(v, planeOffset + p) * lit(1 << p))
      .reduce(_ + _)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distant-supervision quality classifier — the fastText/CCNet curation
  * step this engine's corpus pipeline was missing: learn a linear model
  * from cheap surface features against a trusted weak label (a curated
  * source flag, a metadata language tag), then score the whole corpus
  * with one narrow expression. Reference scope: the reference engine has
  * no learned filter at all (its quality gate is the fixed heuristic this
  * repo mirrors as `qualityScore`); this is an extension operator in the
  * SURVEY §2b "curation" family.
  *
  * Training is batch gradient descent with a RATIONAL sigmoid link
  *   p = 0.5 + (0.5·z) / (1 + |z|)
  * instead of the logistic 1/(1+e^-z): same monotone S-shape and the
  * same 0.5-at-0 decision geometry, but pure {+,·,/,abs} IEEE arithmetic
  * — `exp` is the one libm call whose low bits are NOT pinned across
  * engines (Java intrinsics vs DuckDB's libm), and this engine's oracle
  * gate compares cells exactly. Every cross-row aggregate that feeds the
  * next round is rounded to a fixed decimal grid (the
  * [[Clustering]]/[[graft.operators.Tokenizer]] replay playbook), so a
  * SQL oracle replays the whole trajectory bit-for-bit: within a round
  * all arithmetic is per-row and bit-identical, and the rounding absorbs
  * the ~1 ulp partial-aggregation-order noise of the distributed mean.
  *
  * Scale shape (the 100 TB contract):
  *  - each round is ONE map-side-combined aggregate of `dim+1` cells
  *    over a narrow per-row expression — no shuffle of corpus rows, no
  *    iterated join, constant lineage depth;
  *  - driver state is O(dim) doubles (the model), never data-sized;
  *  - scoring is a pure literal expression over the scan — it pushes
  *    into whole-stage codegen and costs one pass.
  */
object Classifier {

  /** Trained linear model: `weights(0)` is the bias, `weights(i)` pairs
    * with `featureCols(i-1)`. All coordinates sit on the 10^-decimals
    * grid, so the model (not just its scores) is engine-portable. */
  final case class Model(weights: Seq[Double], lr: Double, iters: Int,
                         decimals: Int)

  private def roundTo(x: Double, decimals: Int): Double =
    BigDecimal(x).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** z = ((b + w1·x1) + w2·x2) + … — LEFT fold, the exact shape a SQL
    * replay writes as `b + w1 * x1 + w2 * x2 + …` under left-assoc `+`.
    * Addition is not associative in floats; the order is the contract. */
  private def margin(weights: Seq[Double], xs: Seq[Column]): Column =
    xs.zip(weights.tail).foldLeft(lit(weights.head): Column) {
      case (acc, (x, w)) => acc + lit(w) * x
    }

  /** Rational sigmoid, written `0.5 + (0.5 * z) / (1.0 + abs(z))` on
    * both sides so the two engines execute the identical op sequence. */
  private def link(z: Column): Column =
    lit(0.5) + (lit(0.5) * z) / (lit(1.0) + abs(z))

  /** Fit by `iters` rounds of full-batch gradient descent from w = 0
    * (the zero start makes round 1's margin exactly 0.0 on every row —
    * no initialization to agree on). Per round, the gradient of the
    * squared-residual surrogate is taken as mean((p−y)·x_j), each cell
    * rounded to `decimals` BEFORE the update so both engines step from
    * identical numbers; the update `w − lr·g` is then itself rounded
    * back onto the grid.
    *
    * `labelCol` must be 0.0/1.0 doubles; `featureCols` must already be
    * engine-portable doubles (integer-derived ratios, saturations —
    * see [[graft.functions.TextFunctions.qualityScore]]'s components).
    * Null features/labels: a null row contributes nothing to any
    * gradient cell (avg skips nulls in Spark and SQL alike) and scores
    * to null. */
  def fit(df: DataFrame, labelCol: String, featureCols: Seq[String],
          iters: Int, lr: Double = 4.0, decimals: Int = 6): Model = {
    require(featureCols.nonEmpty, "at least one feature column")
    require(iters >= 0, "iters must be >= 0")
    val base = Parallelism.ensure(df).select(
      col(labelCol).cast(DoubleType).as("__y") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col(c).cast(DoubleType).as(s"__x$i")
        }: _*)
    val xs = featureCols.indices.map(i => col(s"__x$i"))
    var w: Seq[Double] = Seq.fill(featureCols.length + 1)(0.0)
    for (_ <- 0 until iters) {
      val resid = link(margin(w, xs)) - col("__y")
      // avg() over an empty frame (or all-null labels/features) is
      // null; coalesce to 0.0 so the degenerate fit is a well-defined
      // no-op (w stays 0) instead of an NPE at getDouble.
      val cells =
        coalesce(round(avg(resid), decimals), lit(0.0)).as("g0") +:
          xs.zipWithIndex.map { case (x, i) =>
            coalesce(round(avg(resid * x), decimals), lit(0.0))
              .as(s"g${i + 1}")
          }
      val g = base.agg(cells.head, cells.tail: _*).collect().head
      w = w.indices.map(j => roundTo(w(j) - lr * g.getDouble(j), decimals))
    }
    Model(w, lr, iters, decimals)
  }

  /** Per-row score in [0,1] from the trained model — one literal
    * expression, rounded onto the model's grid so downstream threshold
    * comparisons (`score >= 0.5`) are engine-stable. */
  def scoreCol(model: Model, featureCols: Seq[Column]): Column =
    round(link(margin(model.weights, featureCols)), model.decimals)
}

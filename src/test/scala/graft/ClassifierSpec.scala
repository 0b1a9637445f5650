package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Laws for the distant-supervision quality classifier. The c17 oracle
  * gate pins exact DuckDB replay of the training trajectory; this spec
  * pins what that gate cannot see — that the fit LEARNS on separable
  * data — plus the engine invariants: partition/order invariance of the
  * trained weights (the rounding grid must absorb aggregation-order
  * noise), grid membership of the model, and null-row inertness.
  */
class ClassifierSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Linearly separable planted data: positives cluster at x ≈ (0.8, 0.2),
    * negatives at x ≈ (0.2, 0.8), deterministic jitter. */
  private lazy val planted = {
    val rows = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val j1 = ((i * 37) % 100) / 1000.0
      val j2 = ((i * 53) % 100) / 1000.0
      (i.toLong, if (pos) 1.0 else 0.0,
        (if (pos) 0.8 else 0.2) + j1,
        (if (pos) 0.2 else 0.8) + j2)
    }
    rows.toDF("id", "y", "x1", "x2")
  }

  test("fit separates planted classes: every positive outscores every negative") {
    val m = Classifier.fit(planted, "y", Seq("x1", "x2"), iters = 8)
    val scored = planted.select(col("y"),
        Classifier.scoreCol(m, Seq(col("x1"), col("x2"))).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    val pos = scored.collect { case (1.0, s) => s }
    val neg = scored.collect { case (0.0, s) => s }
    assert(pos.min > neg.max,
      s"classes overlap: min positive ${pos.min} <= max negative ${neg.max}")
    assert(pos.min > 0.5 && neg.max < 0.5,
      s"0.5 threshold does not separate: ${pos.min} / ${neg.max}")
  }

  test("trained weights are partition- and order-invariant") {
    val m1 = Classifier.fit(planted.coalesce(1), "y", Seq("x1", "x2"), iters = 5)
    val m7 = Classifier.fit(planted.repartition(7), "y", Seq("x1", "x2"), iters = 5)
    val m32 = Classifier.fit(planted.orderBy(desc("id")).repartition(32),
      "y", Seq("x1", "x2"), iters = 5)
    assert(m1.weights == m7.weights && m7.weights == m32.weights,
      s"weights drift across partitionings: ${m1.weights} / ${m7.weights} / ${m32.weights}")
  }

  test("model coordinates sit on the rounding grid") {
    val m = Classifier.fit(planted, "y", Seq("x1", "x2"), iters = 3)
    m.weights.foreach { w =>
      val scaled = BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(scaled.toDouble == w, s"$w is off the 1e-6 grid")
    }
  }

  test("null feature rows are inert in training and score to null") {
    val withNulls = planted.unionByName(
      Seq((9001L, 1.0, Option.empty[Double], Option(0.5)),
          (9002L, 0.0, Option(0.5), Option.empty[Double]))
        .toDF("id", "y", "x1", "x2"))
    val m0 = Classifier.fit(planted, "y", Seq("x1", "x2"), iters = 4)
    val mN = Classifier.fit(withNulls, "y", Seq("x1", "x2"), iters = 4)
    // a null feature nulls the margin, so the row drops out of EVERY
    // gradient cell (avg skips nulls) — but the row COUNT in the mean's
    // denominator excludes it per-cell identically, so fits agree unless
    // rounding straddles; assert the exact-equality contract on this
    // fixture (it is what the SQL replay computes too)
    assert(mN.weights == m0.weights,
      s"null rows perturbed the fit: ${mN.weights} vs ${m0.weights}")
    val s = withNulls.where(col("id") >= 9000L)
      .select(Classifier.scoreCol(mN, Seq(col("x1"), col("x2"))))
      .collect()
    assert(s.forall(_.isNullAt(0)), "null-feature rows must score to null")
  }

  test("zero iterations yields the 0.5-everywhere prior") {
    val m = Classifier.fit(planted, "y", Seq("x1", "x2"), iters = 0)
    assert(m.weights.forall(_ == 0.0))
    val s = planted.select(Classifier.scoreCol(m, Seq(col("x1"), col("x2"))))
      .distinct().collect()
    assert(s.map(_.getDouble(0)).toSeq == Seq(0.5))
  }

  /** Held-out Mann-Whitney AUC of `model` on `df` via tied ranks —
    * the same statistic c18 hash-gates per source, computed driver-side
    * on the small fixture. */
  private def heldOutAuc(m: Classifier.Model,
                         df: org.apache.spark.sql.DataFrame): Double = {
    val scored = df.select(col("y"),
        Classifier.scoreCol(m, Seq(col("x1"), col("x2"))).as("s"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val byScore = scored.sortBy(_._2)
    val rank = new Array[Double](byScore.length)
    var i = 0
    while (i < byScore.length) {
      var j = i
      while (j < byScore.length && byScore(j)._2 == byScore(i)._2) j += 1
      val avg = (i + 1 + j).toDouble / 2  // mean of ranks i+1..j
      (i until j).foreach(rank(_) = avg)
      i = j
    }
    val nPos = byScore.count(_._1 == 1.0).toDouble
    val n = byScore.length.toDouble
    val srp = byScore.indices.collect {
      case k if byScore(k)._1 == 1.0 => rank(k)
    }.sum
    (srp - nPos * (nPos + 1) / 2) / (nPos * (n - nPos))
  }

  test("more iterations never degrade held-out AUC on the fixture (c18 law)") {
    // deterministic hash split, exactly the c18 recipe
    val train = planted.where(graft.operators.Sampling.hashKeep(col("id"), 12))
    val test = planted.where(!graft.operators.Sampling.hashKeep(col("id"), 12))
    val aucs = Seq(0, 1, 2, 4, 8).map { it =>
      it -> heldOutAuc(
        Classifier.fit(train, "y", Seq("x1", "x2"), iters = it), test)
    }
    assert(aucs.head._2 == 0.5, s"zero-round model must be coin-flip: $aucs")
    aucs.sliding(2).foreach { case Seq((i1, a1), (i2, a2)) =>
      assert(a2 >= a1, s"held-out AUC degraded $i1->$i2 rounds: $a1 -> $a2")
    }
    assert(aucs.last._2 >= 0.9, s"trained AUC below the c18 floor: $aucs")
  }

  test("empty or all-null input is a well-defined no-op fit (zero model)") {
    val empty = planted.where(lit(false))
    val m = Classifier.fit(empty, "y", Seq("x1", "x2"), iters = 3)
    assert(m.weights.forall(_ == 0.0))
    val allNull = planted.select(col("id"),
      lit(null).cast("double").as("y"),
      lit(null).cast("double").as("x1"), lit(null).cast("double").as("x2"))
    val m2 = Classifier.fit(allNull, "y", Seq("x1", "x2"), iters = 3)
    assert(m2.weights.forall(_ == 0.0))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions
import graft.operators.Clustering
import graft.plans.VectorKernelExprs

/** Law spec for the round-19 fused vector kernels (guide §4): each kernel
  * must be BIT-IDENTICAL to the interpreted HOF form it replaced —
  * including the null / ragged-length / empty edges the zip_with+fold
  * composition implies — under both codegen and interpreted eval, and
  * across partition counts. The s14/s17/s18/s2/s3 oracle gates pin the
  * integrated results; this spec isolates the kernels so a divergence
  * names the kernel, not a query. */
class VectorKernelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(421)
  private def vec(dim: Int): Seq[Float] =
    Seq.fill(dim)((rnd.nextFloat() - 0.5f) * (1 << rnd.nextInt(6)))

  /** Fixture: well-formed dim-64 rows, plus ragged, null-element, empty
    * and NULL vectors — every branch of the zip_with semantics. */
  private def fixture(n: Int, dim: Int) = {
    val rows: Seq[(Long, Option[Seq[Option[Float]]])] =
      (0L until n).map { i =>
        i -> Some(vec(dim).map(Option(_)))
      } ++ Seq(
        (n + 0L) -> Some(vec(dim - 3).map(Option(_))), // ragged short
        (n + 1L) -> Some(vec(dim + 2).map(Option(_))), // ragged long
        (n + 2L) -> Some(vec(dim).map(Option(_)).updated(dim / 2, None)), // null elem
        (n + 3L) -> Some(Seq.empty[Option[Float]]), // empty
        (n + 4L) -> None) // null vector
    rows.toDF("id", "v")
  }

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    val xs = a.collect().map(_.toSeq).toSeq
    val ys = b.collect().map(_.toSeq).toSeq
    assert(xs == ys)
  }

  test("centered_dot kernel == HOF form bit-for-bit, all edges") {
    val df = fixture(200, 64).orderBy("id")
    val m = Seq.fill(64)(rnd.nextDouble() - 0.5)
    val d = Seq.fill(64)(rnd.nextDouble() - 0.5)
    assertSame(
      df.select(col("id"), VectorKernelExprs.centeredDot(col("v"), m, d)),
      df.select(col("id"), Clustering.centeredDotHof(col("v"), m, d)))
  }

  test("nearest_centroid kernel == HOF argmin/dist bit-for-bit, ties to smallest id") {
    val df = fixture(200, 16).orderBy("id")
    val cents = Seq.fill(8)(Seq.fill(16)(rnd.nextDouble() - 0.5).toArray)
    // force a tie: centroid 5 duplicates centroid 2 — first-minimum must win
    val tied = cents.updated(5, cents(2))
    // field-level comparison: on degenerate inputs the kernel nulls the
    // STRUCT where the HOF form builds struct(null, null) — getField
    // yields identical values either way, and fields are all any
    // consumer (kmeans assign, centroidDistances) ever extracts
    assertSame(
      df.select(col("id"),
        VectorKernelExprs.nearestCentroid(col("v"), tied.map(_.toSeq), 9)
          .getField("cluster"),
        VectorKernelExprs.nearestCentroid(col("v"), tied.map(_.toSeq), 9)
          .getField("dist")),
      df.select(col("id"),
        Clustering.nearestHof(col("v"), tied, 9).getField("cluster"),
        Clustering.nearestHof(col("v"), tied, 9).getField("dist")))
  }

  test("nearest_centroid rounding matches Spark round() at coarse decimals") {
    // coarse rounding makes distance ties common — the exact HALF_UP
    // boundary behavior must match Spark's Round on doubles
    val df = fixture(500, 8).where(col("v").isNotNull).orderBy("id")
    val cents = Seq.fill(4)(Seq.fill(8)(rnd.nextDouble()).toArray)
    assertSame(
      df.select(col("id"),
        VectorKernelExprs.nearestCentroid(col("v"), cents.map(_.toSeq), 1)
          .getField("cluster"),
        VectorKernelExprs.nearestCentroid(col("v"), cents.map(_.toSeq), 1)
          .getField("dist")),
      df.select(col("id"),
        Clustering.nearestHof(col("v"), cents, 1).getField("cluster"),
        Clustering.nearestHof(col("v"), cents, 1).getField("dist")))
  }

  test("lsh_bucket kernel == HOF form, incl. plane offsets and degenerate inputs") {
    val df = fixture(300, 64).orderBy("id")
    for ((planes, off) <- Seq((1, 0), (4, 0), (4, 4), (8, 16))) {
      assertSame(
        df.select(col("id"), VectorKernelExprs.lshBucket(col("v"), planes, off)),
        df.select(col("id"), VectorFunctions.lshBucketHof(col("v"), planes, off)))
    }
    // 0 planes: the degenerate single bucket
    assertSame(
      df.select(col("id"), VectorKernelExprs.lshBucket(col("v"), 0)),
      df.select(col("id"), VectorFunctions.lshBucketHof(col("v"), 0)))
  }

  test("kernels agree under interpreted eval (codegen fallback path)") {
    val df = fixture(50, 16).orderBy("id")
    val m = Seq.fill(16)(rnd.nextDouble())
    val d = Seq.fill(16)(rnd.nextDouble())
    val cents = Seq.fill(3)(Seq.fill(16)(rnd.nextDouble()).toArray)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assertSame(
        df.select(col("id"), VectorKernelExprs.centeredDot(col("v"), m, d),
          VectorKernelExprs.nearestCentroid(col("v"), cents.map(_.toSeq), 9)
            .getField("cluster"),
          VectorKernelExprs.nearestCentroid(col("v"), cents.map(_.toSeq), 9)
            .getField("dist"),
          VectorKernelExprs.lshBucket(col("v"), 4)),
        df.select(col("id"), Clustering.centeredDotHof(col("v"), m, d),
          Clustering.nearestHof(col("v"), cents, 9).getField("cluster"),
          Clustering.nearestHof(col("v"), cents, 9).getField("dist"),
          VectorFunctions.lshBucketHof(col("v"), 4)))
    }
  }

  test("kernels match HOF forms on NaN and ±Inf inputs (ADVICE r19)") {
    // non-finite elements exercise the three guards the random fixtures
    // never hit: roundD must pass NaN/Inf through (BigDecimal(NaN)
    // throws), the argmin fold must use Spark's NaN-above-everything
    // ordering, and the LSH sign test must treat NaN >= 0 as TRUE.
    val specials = Seq(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, 0.0f, -0.0f)
    val rows: Seq[(Long, Option[Seq[Option[Float]]])] =
      specials.zipWithIndex.map { case (s, i) =>
        i.toLong -> Some(vec(16).map(Option(_)).updated(3, Some(s)))
      } ++ Seq(
        100L -> Some(Seq.fill(16)(Option(Float.NaN))),
        101L -> Some(Seq.fill(16)(Option(Float.PositiveInfinity))),
        102L -> Some(Seq.fill(16)(Option(Float.NegativeInfinity))))
    val df = rows.toDF("id", "v").orderBy("id")
    val m = Seq.fill(16)(rnd.nextDouble() - 0.5)
    val d = Seq.fill(16)(rnd.nextDouble() - 0.5)
    // centroid 0 carries a NaN element — every row's distance to it is
    // NaN, so a Java `<` fold would pin the argmin to 0 while Spark's
    // ordering must pick the nearest FINITE centroid
    val cents = Seq.fill(4)(Seq.fill(16)(rnd.nextDouble()).toArray)
    val nanC = cents.head.clone(); nanC(7) = Double.NaN
    val withNan = cents.updated(0, nanC)
    def kernels(frame: org.apache.spark.sql.DataFrame) = frame.select(
      col("id"),
      VectorKernelExprs.centeredDot(col("v"), m, d),
      VectorKernelExprs.nearestCentroid(col("v"), withNan.map(_.toSeq), 9)
        .getField("cluster"),
      VectorKernelExprs.nearestCentroid(col("v"), withNan.map(_.toSeq), 9)
        .getField("dist"),
      VectorKernelExprs.lshBucket(col("v"), 8))
    def hofs(frame: org.apache.spark.sql.DataFrame) = frame.select(
      col("id"),
      Clustering.centeredDotHof(col("v"), m, d),
      Clustering.nearestHof(col("v"), withNan, 9).getField("cluster"),
      Clustering.nearestHof(col("v"), withNan, 9).getField("dist"),
      VectorFunctions.lshBucketHof(col("v"), 8))
    // toSeq equality is false on NaN (primitive NaN != NaN); compare the
    // exact decimal rendering instead — Double.toString round-trips, so
    // this is still bit-faithful (and distinguishes -0.0 from 0.0)
    def render(frame: org.apache.spark.sql.DataFrame) =
      frame.collect().map(_.toString).toSeq
    assert(render(kernels(df)) == render(hofs(df))) // codegen path
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(render(kernels(df)) == render(hofs(df))) // interpreted path
    }
  }

  test("kernels are partition-count invariant") {
    val df = fixture(100, 32)
    val cents = Seq.fill(4)(Seq.fill(32)(rnd.nextDouble()).toArray)
    val one = df.repartition(1)
      .select(col("id"), VectorKernelExprs.nearestCentroid(
        col("v"), cents.map(_.toSeq), 9).as("n"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val many = df.repartition(7)
      .select(col("id"), VectorKernelExprs.nearestCentroid(
        col("v"), cents.map(_.toSeq), 9).as("n"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(one == many)
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

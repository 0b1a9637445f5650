package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Laws for the deterministic k-means / power-iteration PCA pair.
  *
  * The s17/s18 oracle gates pin exact DuckDB replay on the (near-
  * isotropic) synthetic embeddings; this spec pins the STATISTICAL
  * claims those gates cannot see — that the operators recover real
  * structure where structure exists — plus the engine invariants
  * (partition invariance, assignment self-consistency, empty-cluster
  * retention) on planted fixtures.
  */
class ClusteringSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** 3 planted Gaussians-ish blobs in 8-d, well separated: ids 0..89,
    * blob = id % 3, center = 10·e_blob, deterministic small offsets. */
  private lazy val blobs = {
    val rows = (0 until 90).map { id =>
      val blob = id % 3
      val base = Array.fill(8)(0.0f)
      base(blob) = 10.0f
      // deterministic pseudo-noise in [-0.5, 0.5), different per (id, dim)
      val v = base.zipWithIndex.map { case (b, j) =>
        b + (((id * 31 + j * 17) % 100) / 100.0f - 0.5f)
      }
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "vec")
  }

  test("kmeans recovers planted blobs: 3 clusters, each pure") {
    val a = Clustering.kmeansAssign(blobs, "vec_id", "vec", k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a planted blob lands in the same learned cluster,
    // and the three learned clusters are distinct
    val byBlob = a.groupBy { case (id, _) => id % 3 }
      .map { case (blob, m) => blob -> m.values.toSet }
    assert(byBlob.values.forall(_.size == 1),
      s"a planted blob split across learned clusters: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3,
      s"planted blobs merged: $byBlob")
  }

  test("kmeans is partition-invariant (1, 7, 32 partitions agree)") {
    def run(parts: Int) =
      Clustering.kmeansAssign(blobs.repartition(parts), "vec_id", "vec",
          k = 3, iters = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val base = run(1)
    assert(run(7) == base)
    assert(run(32) == base)
  }

  test("kmeansAssign is the argmin of distance to kmeansCentroids") {
    val cents = Clustering.kmeansCentroids(blobs, "vec_id", "vec",
      k = 3, iters = 4)
    val a = Clustering.kmeansAssign(blobs, "vec_id", "vec", k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val data = blobs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    data.foreach { case (id, x) =>
      val dists = cents.map(c =>
        x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      val want = dists.indexOf(dists.min).toLong
      assert(a(id) == want, s"row $id assigned ${a(id)}, argmin is $want")
    }
  }

  test("a cluster that loses all members keeps its seed centroid") {
    // 2 distinct points, k = 3: the third seed duplicates a point and
    // goes empty after the first assignment (ties go to the smaller id)
    val tiny = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)), (2L, Seq(5.0f, 5.0f)),
      (3L, Seq(5.0f, 5.0f))).toDF("vec_id", "vec")
    val cents = Clustering.kmeansCentroids(tiny, "vec_id", "vec",
      k = 3, iters = 3)
    assert(cents.size == 3)
    // cluster 1 seeded at (0,0) like cluster 0, loses the tie every
    // round, and must still be present with its seed coordinates
    assert(cents(1).toSeq == Seq(0.0, 0.0))
    val a = Clustering.kmeansAssign(tiny, "vec_id", "vec", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  /** Spectrally-peaked fixture: variance along a planted direction
    * dominates every other axis, so 8 power rounds must align with it. */
  private lazy val peaked = {
    val d = 8
    val dir = Array.tabulate(d)(j => if (j % 2 == 0) 0.5 else -0.5)
    val rows = (0 until 200).map { id =>
      val t = (id % 21) - 10.0 // strong spread along dir: [-10, 10]
      val v = Array.tabulate(d) { j =>
        (t * dir(j) + (((id * 13 + j * 7) % 100) / 1000.0 - 0.05)).toFloat
      }
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "vec")
  }

  test("pcaFit converges to the planted dominant direction") {
    val (_, v) = Clustering.pcaFit(peaked, "vec", iters = 8)
    val planted = Array.tabulate(8)(j => if (j % 2 == 0) 0.5 else -0.5)
    val pNorm = math.sqrt(planted.map(x => x * x).sum)
    val cos = math.abs(
      v.zip(planted).map { case (a, b) => a * b }.sum / pNorm)
    assert(cos > 0.99, s"|cos(v, planted)| = $cos")
    // and the direction is unit-length (up to the rounding grid)
    val n = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-4, s"|v| = $n")
  }

  test("pcaProject is partition-invariant and matches fit + manual dot") {
    def run(parts: Int) =
      Clustering.pcaProject(peaked.repartition(parts), "vec_id", "vec",
          iters = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val base = run(1)
    assert(run(32) == base)
    // scores equal the centered dot with the returned direction
    val (m, v) = Clustering.pcaFit(peaked, "vec", iters = 8)
    val data = peaked.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val byId = base.toMap
    data.foreach { case (id, x) =>
      val s = x.indices.map(j => (x(j) - m(j)) * v(j)).sum
      assert(math.abs(byId(id) - s) < 1e-6, s"row $id")
    }
  }

  test("pcaFitK with k=1 equals pcaFit bit for bit") {
    val (m1, v1) = Clustering.pcaFit(peaked, "vec", iters = 8)
    val (mk, vs) = Clustering.pcaFitK(peaked, "vec", k = 1, iters = 8)
    assert(m1.toSeq == mk.toSeq)
    assert(vs.size == 1 && vs.head.toSeq == v1.toSeq)
  }

  /** Two planted orthogonal directions with well-separated variance. */
  private lazy val twoAxes = {
    val d = 6
    val dir1 = Array(0.5, -0.5, 0.5, -0.5, 0.0, 0.0)
    val dir2 = Array(0.0, 0.0, 0.0, 0.0, 0.7071, 0.7071)
    val rows = (0 until 240).map { id =>
      val t1 = (id % 25) - 12.0        // dominant spread along dir1
      val t2 = ((id / 25) % 9) - 4.0   // weaker spread along dir2
      val v = Array.tabulate(d) { j =>
        (t1 * dir1(j) + t2 * dir2(j) +
          (((id * 11 + j * 5) % 100) / 1000.0 - 0.05)).toFloat
      }
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "vec")
  }

  test("deflation recovers a second planted direction, near-orthogonal to the first") {
    val (_, vs) = Clustering.pcaFitK(twoAxes, "vec", k = 2, iters = 12)
    def cosWith(v: Array[Double], d: Array[Double]): Double = {
      val dn = math.sqrt(d.map(x => x * x).sum)
      math.abs(v.zip(d).map { case (a, b) => a * b }.sum / dn)
    }
    val dir1 = Array(0.5, -0.5, 0.5, -0.5, 0.0, 0.0)
    val dir2 = Array(0.0, 0.0, 0.0, 0.0, 0.7071, 0.7071)
    assert(cosWith(vs(0), dir1) > 0.99, s"pc1 off: ${vs(0).toSeq}")
    assert(cosWith(vs(1), dir2) > 0.99, s"pc2 off: ${vs(1).toSeq}")
    val ortho = math.abs(vs(0).zip(vs(1)).map { case (a, b) => a * b }.sum)
    assert(ortho < 0.01, s"components not orthogonal: $ortho")
  }

  test("streamed cluster routing equals the batch assignment") {
    val cents = Clustering.kmeansCentroids(blobs, "vec_id", "vec",
      k = 3, iters = 4)
    val feed = java.nio.file.Files.createTempDirectory("cluster_feed").toString
    blobs.coalesce(2).write.mode("overwrite").parquet(feed)
    val out = java.nio.file.Files.createTempDirectory("cluster_out").toString
    val q = graft.streaming.ClusterStream.assignStream(
        spark.readStream.schema(blobs.schema)
          .option("maxFilesPerTrigger", "1").parquet(feed),
        "vec_id", "vec", cents)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cluster_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = Clustering.kmeansAssign(blobs, "vec_id", "vec",
        k = 3, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed == batch)
  }

  test("standardize is partition-invariant, zero-mean-unit-scale per dim, zero on flat dims") {
    def run(parts: Int) =
      Clustering.standardize(blobs.repartition(parts), "vec_id", "vec")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq
    val base = run(1)
    assert(run(32) == base)
    // a constant dimension standardizes to exactly zero everywhere
    val withFlat = (0 until 40)
      .map(i => (i.toLong, Seq(i.toFloat, 7.5f)))
      .toDF("vec_id", "vec")
    val z = Clustering.standardize(withFlat, "vec_id", "vec").collect()
    // dim 2 is flat -> contributes 0; all z come from dim 1, whose
    // population z-scores are bounded and sum-of-squares ≈ n
    val norms = z.map(r => r.getDouble(3))
    val sumSq = norms.map(x => x * x).sum
    assert(math.abs(sumSq - 40.0) < 0.1,
      s"z-norms' sum of squares $sumSq !~ n (unit-variance law)")
  }

  test("pca on zero-variance data publishes the zero direction") {
    val flat = (0 until 10).map(i => (i.toLong, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "vec")
    val (m, v) = Clustering.pcaFit(flat, "vec", iters = 3)
    assert(m.toSeq == Seq(1.0, 2.0, 3.0))
    assert(v.forall(_ == 0.0))
    val scores = Clustering.pcaProject(flat, "vec_id", "vec", iters = 3)
      .collect().map(_.getDouble(1))
    assert(scores.forall(_ == 0.0))
  }
}

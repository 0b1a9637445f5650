package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("pageRank on a 2-cycle is uniform at every iteration count") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    for (iters <- Seq(0, 1, 7)) {
      val got = Graph.pageRank(edges, "src", "dst", iterations = iters)
        .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(got.map(_._1).toSeq === Seq("a", "b"))
      got.foreach { case (_, r) => assert(math.abs(r - 0.5) < 1e-12) }
    }
  }

  test("pageRank on a symmetric star converges toward the known fixpoint") {
    import spark.implicits._
    // hub a <-> leaves b, c: fixpoint a = 0.15/3 + 0.85(rb + rc),
    // rb = rc = 0.15/3 + 0.85 * ra/2  =>  ra ~ 0.48649, rb = rc ~ 0.25676
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iterations = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // geometric convergence at rate ~0.85^k: 30 rounds land within ~1e-3
    assert(math.abs(got("a") - 0.135 / 0.2775) < 5e-3)
    assert(got("b") === got("c")) // symmetry is exact, not approximate
    assert(math.abs(got("a") + got("b") + got("c") - 1.0) < 1e-9,
      "no dangling vertices -> rank mass is conserved")
  }

  test("triangleCounts: K4 clique, path zeros, dirty-input canonicalization") {
    import spark.implicits._
    // K4 on {1,2,3,4} fed as a dirty edge list: reversed duplicates and a
    // self-loop must not change the count. Every vertex sits in C(3,2)=3
    // of the 4 triangles.
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 3L), (2L, 2L)).toDF("a", "b")
    val gotK4 = Graph.triangleCounts(k4, "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotK4 === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // a path has no triangles but every vertex still reports a zero row
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val gotPath = Graph.triangleCounts(path, "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotPath === Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)))
  }

  test("pageRank drops dangling mass but still ranks by in-links") {
    import spark.implicits._
    // directed chain a -> b -> c: c is dangling (outdeg 0)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iterations = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a only gets teleport; b teleport + a's mass; c teleport + b's mass
    assert(got("a") < got("b") && got("b") < got("c"))
    assert(math.abs(got("a") - 0.15 / 3) < 1e-9)
  }

  test("redistributing pageRank conserves total mass = 1 on any graph") {
    import spark.implicits._
    def totalMass(edges: Seq[(String, String)], iters: Int): Double =
      Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
          iterations = iters, redistributeDangling = true)
        .agg(org.apache.spark.sql.functions.sum("rank"))
        .head().getDouble(0)
    // chain with a dangler, a pure sink pair, and a star whose leaves all
    // dangle — the shapes where dropped-mass mode leaks the most
    val chain = Seq(("a", "b"), ("b", "c"))
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"))
    for (edges <- Seq(chain, star); iters <- Seq(1, 7, 20))
      assert(math.abs(totalMass(edges, iters) - 1.0) < 1e-9,
        s"mass not conserved for $edges at $iters iterations")
    // dropped-mass mode on the same chain leaks below 1 — the difference
    // the option exists to close
    val dropped = Graph.pageRank(chain.toDF("src", "dst"), "src", "dst",
        iterations = 20)
      .agg(org.apache.spark.sql.functions.sum("rank")).head().getDouble(0)
    assert(dropped < 0.999)
  }

  test("redistribution is a no-op on graphs without danglers") {
    import spark.implicits._
    // symmetric edges: every vertex has out-links, both modes identical
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    def ranks(redistribute: Boolean): Map[String, Double] =
      Graph.pageRank(edges, "src", "dst", iterations = 12,
          redistributeDangling = redistribute)
        .collect().map(r => r.getString(0) ->
          BigDecimal(r.getDouble(1)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
            .toDouble).toMap
    assert(ranks(redistribute = true) === ranks(redistribute = false))
  }

  test("shortestHops: path distances, horizon nulls, disconnected nulls, multi-seed min") {
    import spark.implicits._
    // symmetric path 0-1-2-3-4-5 plus a disconnected pair 10-11
    val path = (0L to 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edges = (path ++ Seq((10L, 11L), (11L, 10L))).toDF("src", "dst")
    def hops(seeds: Seq[Long], maxHops: Int): Map[Long, Option[Int]] =
      Graph.shortestHops(edges, "src", "dst", seeds.toDF("seed"), "seed", maxHops)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    val fromZero = hops(Seq(0L), 3)
    assert((0L to 3L).forall(i => fromZero(i).contains(i.toInt)))
    // beyond the horizon and off-component: honestly null
    assert(fromZero(4L).isEmpty && fromZero(5L).isEmpty)
    assert(fromZero(10L).isEmpty && fromZero(11L).isEmpty)
    // two seeds: nearest wins
    val both = hops(Seq(0L, 5L), 3)
    assert(both(2L).contains(2) && both(3L).contains(2) && both(4L).contains(1))
    assert(both(10L).isEmpty)
  }
}

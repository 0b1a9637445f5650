package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilter

/** Contract of the runtime Bloom-filter join pruning: zero false
  * negatives (the correctness half), genuine probe-side pruning (the
  * point of the operator), and exact-join equivalence end to end. */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val lake = Lake(spark, sf0001)

  test("no false negatives: every build key passes mightContain") {
    val dim = lake.part.where(col("p_size") >= 40).select("p_partkey")
    val bloom = RuntimeFilter.bloomBuild(dim, "p_partkey")
    val missed = dim.where(!RuntimeFilter.mightContain(col("p_partkey"), bloom)).count()
    assert(missed === 0L)
  }

  test("probe side is genuinely pruned, and never below the matching set") {
    val dim = lake.part.where(col("p_size") >= 48).select("p_partkey")
    val bloom = RuntimeFilter.bloomBuild(dim, "p_partkey")
    val li = lake.lineitem
    val total = li.count()
    val kept = li.where(RuntimeFilter.mightContain(col("l_partkey"), bloom)).count()
    val matching = li.join(dim, col("l_partkey") === col("p_partkey")).count()
    assert(kept < total, "filter should drop non-matching probe rows")
    assert(kept >= matching, "filter must never drop a matching probe row")
  }

  test("bloomJoin output equals the plain exact join") {
    val dim = lake.part.where(col("p_size") >= 48).select("p_partkey", "p_brand")
    val viaBloom = RuntimeFilter.bloomJoin(lake.lineitem, "l_partkey", dim, "p_partkey")
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val plain = lake.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("empty build side rejects every probe row") {
    val empty = lake.part.where(lit(false)).select("p_partkey")
    val bloom = RuntimeFilter.bloomBuild(empty, "p_partkey", mBits = 1 << 10)
    assert(bloom.forall(_ == 0L))
    val kept = lake.lineitem
      .where(RuntimeFilter.mightContain(col("l_partkey"), bloom)).count()
    assert(kept === 0L)
  }

  test("argument guards") {
    val dim = lake.part.select("p_partkey")
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomBuild(dim, "p_partkey", mBits = 100)
    }
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomBuild(dim, "p_partkey", k = 0)
    }
  }
}

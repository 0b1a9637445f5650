package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Lake}
import graft.operators.RuntimeFilter

/** Measures what the runtime Bloom filter actually buys: the q45 shape
  * (lineitem ⋈ selective part subset) with broadcast DISABLED so the
  * join shuffles — the 100 TB regime where both sides exceed the
  * broadcast threshold and the filter's job is to shrink the probe-side
  * exchange. Three variants, best-of-3 each:
  *
  *   plain_smj     full lineitem shuffled into the join
  *   bloom_smj     probe pre-filtered by the build side's Bloom filter
  *   broadcast     the small-dim fast path (reference point; bloom is
  *                 pointless when the build side broadcasts)
  *
  * The probe side is amplified `amp`× (default 16 — ~10M rows at
  * sf0.1): at the raw sf0.1 row count the whole shuffle is a few MB and
  * the filter's per-row probe cost cancels what it saves; the operator
  * only pays off when the probe-side exchange dominates, which is
  * exactly the 100 TB regime being modeled.
  *
  * Usage: runMain graft.tools.BloomBench [sfDir] [amp]. */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val amp = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = GraftSession.local("bloom-bench")
    spark.sparkContext.setLogLevel("WARN")
    val lake = Lake(spark, sfDir)
    val dim = lake.part.where(col("p_size") >= 48).select("p_partkey")
    val li = lake.lineitem
      .withColumn("rep", explode(sequence(lit(1), lit(amp))))

    def time(name: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"BLOOM $name%-12s ${best._1}%8.2f s  rows=${best._2}")
    }

    time("warmup")(li.count() + dim.count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("plain_smj")(li.join(dim, col("l_partkey") === col("p_partkey")).count())
    time("bloom_smj") {
      val bloom = RuntimeFilter.bloomBuild(dim, "p_partkey")
      li.where(RuntimeFilter.mightContain(col("l_partkey"), bloom))
        .join(dim, col("l_partkey") === col("p_partkey")).count()
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    time("broadcast")(li.join(broadcast(dim),
      col("l_partkey") === col("p_partkey")).count())
    spark.stop()
  }
}

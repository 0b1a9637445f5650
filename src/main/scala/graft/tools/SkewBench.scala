package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.SkewJoin

/** Skew demonstration: a sort-merge join where 90% of the left rows carry
  * one hot key, three ways — AQE skew splitting ON, OFF, and explicit
  * salting. Broadcast is disabled so the join actually shuffles (a
  * broadcast join is skew-immune, which is why AQE+broadcast is always
  * the first resort). Usage: runMain graft.tools.SkewBench [leftRows]. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nLeft = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = GraftSession.local("skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // 90% of rows hit key 0; the rest spread over 100k keys
    val left = spark.range(nLeft).select(col("id"),
      when(col("id") % 10 =!= 0, lit(0L))
        .otherwise(col("id") % 100000).as("k"))
    val right = spark.range(100000).select(col("id").as("k"),
      (col("id") * 7).as("payload"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SKEW $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup")(left.count() + right.count())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("smj_no_aqe_skew")(left.join(right, "k").count())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("smj_aqe_skew")(left.join(right, "k").count())
    time("salted")(SkewJoin.saltedJoin(left, right, "k", salts = 32).count())
    spark.stop()
  }
}

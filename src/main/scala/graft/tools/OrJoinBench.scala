package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.OrEquiJoin
import graft.plans.OrEquiJoinRule

/** Micro-benchmark: the OR-equi left join at synthetic scale, three ways —
  * nested loop (what the reference's plan does), the injected optimizer
  * rule, and the explicit operator. Usage: runMain graft.tools.OrJoinBench
  * [leftRows] [rightRows]. */
object OrJoinBench {
  def main(args: Array[String]): Unit = {
    val nLeft = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nRight = args.drop(1).headOption.map(_.toLong).getOrElse(2000L)
    val spark = GraftSession.local("orjoin-bench")
    import spark.implicits._

    val left = spark.range(nLeft)
      .select(col("id"),
        (col("id") % 500).cast("string").as("k1"),
        (col("id") % 997).cast("string").as("k2"))
    val right = spark.range(nRight)
      .select(col("id").as("rid"),
        (col("id") % 450).cast("string").as("r1"),
        ((col("id") % 800) + 200).cast("string").as("r2"))

    def naive() = left.join(right,
      col("k1") === col("r1") || col("k2") === col("r2"), "left")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"ORJOIN $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup")(left.count() + right.count())
    // GraftSession arms the rule by default — disarm for the BNLJ leg
    spark.conf.set(OrEquiJoinRule.ConfKey, "false")
    time("nested_loop")(naive().count())
    spark.conf.set(OrEquiJoinRule.ConfKey, "true")
    time("optimizer_rule")(naive().count())
    spark.conf.set(OrEquiJoinRule.ConfKey, "false")
    time("explicit_operator")(
      OrEquiJoin.leftOrJoin(left, right, ("k1", "r1"), ("k2", "r2")).count())
    spark.stop()
  }
}

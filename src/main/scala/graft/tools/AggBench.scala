package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftSession, Lake}

/** Dev-only: decimal-sum vs integer-cents aggregation cost on q02's shape. */
object AggBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("agg-bench")
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.operators.Parallelism.ensure(Lake(spark, dir).lineitem)
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    def dsum(c: org.apache.spark.sql.Column) = sum(dec(c)).cast(DoubleType)
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast(LongType)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"AGG $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (rep <- 1 to 3) {
      t(s"decimal_$rep")(li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")).count())
      t(s"cents_$rep")(li.groupBy("l_returnflag", "l_linestatus")
        .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * (lit(10000L) - cents(col("l_discount")) * 100L)) / 1e8)
            .as("sum_disc_price"),
          (sum(cents(col("l_quantity"))) / 100.0 / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")).count())
    }
    spark.stop()
  }
}

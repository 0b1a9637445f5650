package graft.tools

import graft.{GraftSession, Lake}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timer for the q87 gate: names where its wall time goes
  * (stage existence probe, loadStarStats, view setup, plan probe,
  * execution). Diagnostic only — not part of the driver contract. */
object Q87Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q87prof] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.operators.ZoneMapTable
    val stage = s"target/star_stage/q87_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val marker = new org.apache.hadoop.fs.Path(s"$stage/customer/_zonemap")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    t("exists") { fs.exists(marker) }
    if (!fs.exists(marker)) t("build") {
      val lk = Lake(spark, sfDir)
      ZoneMapTable.write(lk.customer, s"$stage/customer", "c_custkey",
        Seq("c_custkey"), 2,
        sketchCols = Seq("c_name", "c_acctbal", "c_custkey", "c_nationkey"))
      ZoneMapTable.write(lk.supplier, s"$stage/supplier", "s_suppkey",
        Seq("s_suppkey"), 1,
        sketchCols = Seq("s_name", "s_acctbal", "s_suppkey", "s_nationkey"))
    }
    t("deregister") {
      for (tb <- Seq("customer", "supplier"))
        graft.plans.StarStatsRegistry.deregister(
          graft.plans.StarStatsRegistry.qualify(spark, s"$stage/$tb/data"))
    }
    val child = t("newSession") { spark.newSession() }
    child.conf.set(graft.plans.OrEquiJoinRule.ConfKey, "true")
    t("views") {
      child.read.parquet(s"$stage/customer/data")
        .createOrReplaceTempView("customer_zm")
      child.read.parquet(s"$stage/supplier/data")
        .createOrReplaceTempView("supplier_zm")
    }
    val df = t("sql") { child.sql(
      """SELECT c_custkey, COUNT(s_suppkey) AS n_match,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer_zm LEFT JOIN supplier_zm
        |  ON c_name = s_name OR c_acctbal = s_acctbal
        |    OR c_custkey = s_suppkey OR c_nationkey = s_nationkey
        |GROUP BY c_custkey""".stripMargin) }
    def decorate(eager: Boolean, b0Key: String) =
      df.select(col("c_custkey"), col("n_match"), col("bal"),
          lit(eager).as("plan_eager"), lit(b0Key).as("b0_key"))
        .orderBy("c_custkey")
    val probe = decorate(eager = false, b0Key = "probe").queryExecution
    t("optimize") { probe.optimizedPlan }
    t("executedPlan") { probe.executedPlan.toString }
    t("execute") { decorate(eager = true, b0Key = "x").collect().length }
    t("execute2") { decorate(eager = true, b0Key = "x").collect().length }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object DumpSchemas {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[4]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lake = graft.Lake(spark, "/root/testdata/sf0.01")
    for (n <- graft.Lake.tableNames) {
      val df = if (n == "events") lake.events else lake.table(n)
      println(s"TABLE $n = " + df.schema.fields.map(f =>
        s"${f.name}:${f.dataType.catalogString}").mkString("; "))
    }
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The lake-wide drift tripwire: a clean lake passes, EITHER physical
  * events generation passes (the adapter is part of the contract), and
  * a re-typed column fails naming the drifted table. */
class SchemaContractSpec extends AnyFunSuite {
  import TestSpark._

  /** A lake dir whose tables are symlinks into sf0.001, with optional
    * per-table overrides written as real parquet. */
  private def lakeWith(overrides: Map[String, org.apache.spark.sql.DataFrame]): Lake = {
    val dir = Files.createTempDirectory("contract_lake").toString
    Lake.tableNames.foreach { n =>
      overrides.get(n) match {
        case Some(df) =>
          df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
        case None => Files.createSymbolicLink(
          Paths.get(s"$dir/$n.parquet"), Paths.get(s"$sf0001/$n.parquet"))
      }
    }
    Lake(spark, dir)
  }

  test("the driver-generated lake at every SF satisfies the recorded contract") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      assert(SchemaContract.drift(Lake(spark, sf)) === Seq.empty, s"at $sf")
    }
  }

  test("the legacy epoch-nanos events generation passes through the adapter") {
    val legacy = Lake(spark, sf0001).events
      .withColumn("ts", (unix_micros(col("ts")) * 1000L).as("ts"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(legacy.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    val lake = lakeWith(Map("events" -> legacy))
    assert(SchemaContract.drift(lake) === Seq.empty)
    // and the streaming reader normalizes the same generation: its
    // schema sniff must hand back TimestampType rows, not raw longs
    val stream = graft.streaming.EventsStream.readEvents(spark, s"${lake.dir}/events.parquet")
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("a re-typed column fails loudly naming the drifted table") {
    val retyped = Lake(spark, sf0001).lineitem
      .withColumn("l_quantity", col("l_quantity").cast("string"))
    val lake = lakeWith(Map("lineitem" -> retyped))
    val d = SchemaContract.drift(lake)
    assert(d.size === 1)
    assert(d.head.contains("table 'lineitem'"))
    assert(d.head.contains("l_quantity:double"))   // expected-but-absent
    assert(d.head.contains("l_quantity:string"))   // unexpected
    val e = intercept[IllegalStateException] { SchemaContract.check(lake) }
    assert(e.getMessage.contains("lineitem"))
    // clean tables stay clean — the failure is named, not global
    assert(!d.exists(_.contains("'orders'")))
  }

  test("a dropped column and a missing table both report by name") {
    val narrowed = Lake(spark, sf0001).orders.drop("o_orderpriority")
    val lake = lakeWith(Map("orders" -> narrowed))
    val dir2 = Files.createTempDirectory("contract_lake_missing").toString
    val missing = Lake(spark, dir2) // nothing inside
    assert(SchemaContract.drift(lake).exists(m =>
      m.contains("'orders'") && m.contains("o_orderpriority:string")))
    val all = SchemaContract.drift(missing)
    assert(all.size === Lake.tableNames.size)
    assert(all.forall(_.contains("unreadable")))
  }
}

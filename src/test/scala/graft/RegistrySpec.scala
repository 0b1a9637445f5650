package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants over the WHOLE declared query registry.
  *
  * The driver's comparator row-sorts both result frames with pandas
  * `sort_values` over every output column before hashing; a nested cell
  * (struct/map/array) is unhashable there and fails the query even when
  * the values match (CORRECTNESS_r04 lost q33/q34/s5/s7/t10/t18 exactly
  * this way). This spec makes the constraint structural: every registered
  * query must analyze to a schema of atomic, comparator-safe columns.
  */
class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  private def atomic(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _: BinaryType => false // pandas sorts bytes, but parquet/duckdb
    // binary round-trips are not hash-compared anywhere; forbid to keep
    // the dump surface uniform (media queries emit md5 hex instead)
    case _ => true
  }

  test("every registered query emits only atomic comparator-safe columns") {
    val bad = SparkEntry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema = q.fn(spark, sf0001).schema
      val nested = schema.fields.filterNot(f => atomic(f.dataType))
      if (nested.isEmpty) None
      else Some(s"$name: ${nested.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(bad.isEmpty, s"nested/binary output columns break the driver's " +
      s"pandas row sort:\n  ${bad.mkString("\n  ")}")
  }

  test("every registered query orders by columns it outputs (total order owned by the plan)") {
    // cheap proxy: analysis succeeds and the schema is non-empty with
    // unique column names (duplicate names break the column-sorted compare)
    SparkEntry.all.foreach { case (name, q) =>
      val cols = q.fn(spark, sf0001).schema.fieldNames
      assert(cols.nonEmpty, s"$name: empty schema")
      assert(cols.distinct.length == cols.length,
        s"$name: duplicate output column names ${cols.mkString(",")}")
    }
  }
}

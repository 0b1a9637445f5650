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
    case TimestampType => false // the NTZ convention, made structural:
    // an LTZ output dumps as annotated UTC micros, pandas reads it
    // tz-AWARE, and the compare against DuckDB's naive timestamp fails.
    // Legacy INT96 output masked this for four queries for eleven
    // rounds (no annotation → naive read); with INT64-micros output the
    // convention is load-bearing — cast LTZ outputs to TimestampNTZType
    // (value-preserving under the UTC session).
    case _ => true
  }

  test("every registered query emits only atomic comparator-safe columns") {
    val bad = SparkEntry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema = q.fn(spark, sf0001).schema
      val nested = schema.fields.filterNot(f => atomic(f.dataType))
      if (nested.isEmpty) None
      else Some(s"$name: ${nested.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(bad.isEmpty, s"nested/binary/tz-aware output columns break the " +
      s"driver's pandas compare:\n  ${bad.mkString("\n  ")}")
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

  test("to_json serialization renders null fields instead of dropping them (q33/q34 null hardening)") {
    // Spark's to_json DEFAULT is ignoreNullFields=true, which silently
    // drops a null struct field — `{"n_chars":42}` — while the DuckDB
    // oracle's CASE renders `{"lang":null,"n_chars":42}`. q33/q34 pin
    // ignoreNullFields=false; this pins the rendering on a synthetic
    // null row so the gate no longer depends on "no nulls in this
    // corpus" staying true.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Option.empty[String], Some(42L), Option.empty[String]),
      (2L, Some("en"), Option.empty[Long], Some("web")))
      .toDF("doc_id", "lang", "n_chars", "source")
    val out = df.select(
      to_json(struct(col("lang"), col("n_chars")),
        Map("ignoreNullFields" -> "false")).as("meta_json"),
      to_json(map(lit("lang"), col("lang"), lit("source"), col("source")),
        Map("ignoreNullFields" -> "false")).as("m_json"),
      // the oracle side, replayed through Spark SQL (same CASE text the
      // DuckDB oracle uses, modulo the :: cast syntax)
      expr("""'{"lang":' ||
        CASE WHEN lang IS NULL THEN 'null' ELSE '"' || lang || '"' END ||
        ',"n_chars":' ||
        CASE WHEN n_chars IS NULL THEN 'null' ELSE CAST(n_chars AS STRING) END ||
        '}'""").as("oracle_meta"),
      expr("""'{"lang":' ||
        CASE WHEN lang IS NULL THEN 'null' ELSE '"' || lang || '"' END ||
        ',"source":' ||
        CASE WHEN source IS NULL THEN 'null' ELSE '"' || source || '"' END ||
        '}'""").as("oracle_m"))
      .orderBy("meta_json").collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(2),
        s"struct json ${r.getString(0)} != oracle ${r.getString(2)}")
      assert(r.getString(1) == r.getString(3),
        s"map json ${r.getString(1)} != oracle ${r.getString(3)}")
    }
    assert(out.exists(_.getString(0).contains(""""lang":null""")),
      "null struct field must render as literal null, not be dropped")
  }
}

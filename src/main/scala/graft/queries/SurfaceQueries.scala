package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Lake

/** Remaining engine-surface inventory: the JSON source (reference S1,
  * `etl.py:35-36,77-78`), exact distinct-counting, and the SQL-text
  * interface (`spark.sql` over registered views) — including a query whose
  * Spark-side SQL string IS the oracle string, token for token. */
object SurfaceQueries {

  /** Explicit schema for the JSON round trip (inference would be an extra
    * full scan — SURVEY.md §1). */
  private val docJsonSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** One SQL text, two engines (TPC-H Q4 shape; dialect-neutral). */
  private val sharedSql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1999-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val defs: Map[String, Q] = Map(

    // ---- S1: JSON sink + source scan with explicit schema --------------
    // Writes the documents table as JSON and reads it back — exercising
    // the reference's ingestion format on the engine's own sink/source
    // pair; the oracle reads the original Parquet (round trip must be
    // lossless for these types).
    "q21_json_roundtrip" -> Q(
      (s, dir) => {
        val stage = s"/root/repo/target/json_stage/documents_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        Lake(s, dir).documents.write.mode("overwrite").json(stage)
        s.read.schema(docJsonSchema).json(stage)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy("lang")
      },
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // ---- exact distinct counting (COUNT DISTINCT expand) ---------------
    "q22_distinct_counts" -> Q(
      (s, dir) => Lake(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS distinct_parts,
        |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- SQL-text interface: the same string runs on both engines ------
    "q23_sql_text" -> Q(
      (s, dir) => { Lake(s, dir).registerViews(); s.sql(sharedSql) },
      sharedSql),

    // ---- native expression through the SQL surface ---------------------
    // cosine_similarity is the engine's fused codegen expression,
    // registered via SparkSessionExtensions.injectFunction.
    "q24_sql_cosine" -> Q(
      (s, dir) => {
        Lake(s, dir).registerViews()
        s.sql(
          """SELECT a.vec_id AS id_a, b.vec_id AS id_b
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE cosine_similarity(a.embedding, b.embedding) >= 0.4
            |ORDER BY id_a, id_b""".stripMargin)
      },
      None)
  )
}

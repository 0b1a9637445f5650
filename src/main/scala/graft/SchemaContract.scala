package graft

import org.apache.spark.sql.DataFrame

/** Recorded schema contract for every test-lake table — the drift
  * tripwire the r8→r9 testdata regeneration showed the engine needs:
  * the driver re-typed `events.ts` between rounds and 17 queries
  * silently vanished from the correctness report, because the break
  * surfaced only as per-query failures a full round later. This records
  * the expected LOGICAL schema (as seen THROUGH [[Lake]]'s ingest
  * adapters, so both physical `events.ts` generations normalize to one
  * contract) and diffs it against the actual directory at session
  * start — a drifted table fails loudly BY NAME before any query runs.
  *
  * Regenerate the fingerprints with `runMain graft.tools.DumpSchemas`
  * after an INTENTIONAL testdata change; an unintentional one is
  * exactly what this is for.
  */
object SchemaContract {

  /** table → ordered `name:catalogType` column fingerprints. */
  val expected: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string",
      "c_nationkey:int", "c_acctbal:double", "c_mktsegment:string"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string",
      "s_nationkey:int", "s_acctbal:double"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint",
      "o_orderstatus:string", "o_totalprice:double",
      "o_orderdate:timestamp", "o_orderpriority:string"),
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint",
      "l_suppkey:bigint", "l_linenumber:int", "l_quantity:double",
      "l_extendedprice:double", "l_discount:double", "l_tax:double",
      "l_returnflag:string", "l_linestatus:string", "l_shipdate:timestamp"),
    "events" -> Seq("event_id:bigint", "ts:timestamp", "user_id:bigint",
      "event_type:string", "value:double", "props:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>",
      "label:int"))

  private def fingerprint(df: DataFrame): Seq[String] =
    df.schema.fields.toSeq.map(f => s"${f.name}:${f.dataType.catalogString}")

  /** One drift message per table whose post-adapter schema differs from
    * the contract (missing tables report too). Empty = clean. */
  def drift(lake: Lake): Seq[String] =
    Lake.tableNames.flatMap { name =>
      val want = expected(name)
      (try Right(fingerprint(
        if (name == "events") lake.events else lake.table(name)))
      catch { case e: Throwable => Left(e.getMessage) }) match {
        case Left(msg) =>
          Some(s"table '$name' unreadable under ${lake.dir}: $msg")
        case Right(got) if got == want => None
        case Right(got) =>
          val missing = want.diff(got)
          val extra = got.diff(want)
          Some(s"table '$name' drifted from the schema contract: " +
            (if (missing.nonEmpty) s"expected-but-absent [${missing.mkString(", ")}] " else "") +
            (if (extra.nonEmpty) s"unexpected [${extra.mkString(", ")}] " else "") +
            s"(regenerate via graft.tools.DumpSchemas if intentional)")
      }
    }

  /** Throws naming every drifted table; no-op on a clean lake. */
  def check(lake: Lake): Unit = {
    val d = drift(lake)
    if (d.nonEmpty) throw new IllegalStateException(
      s"schema contract violated:\n  ${d.mkString("\n  ")}")
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Lake
import graft.operators.{AsOfJoin, RangeJoin, RuntimeFilter}

/** Specialized join inventory: as-of and range joins — operators Spark
  * lacks natively, built as shuffle-bounded compositions (SURVEY.md §2b,
  * "custom operators" preference (a)). Both oracled: DuckDB has native
  * ASOF JOIN, and the banded range join reduces to a BETWEEN predicate. */
object JoinQueries {

  val defs: Map[String, Q] = Map(

    // ---- as-of join: latest prior purchase per event --------------------
    "a1_asof_purchase" -> Q(
      (s, dir) => {
        val ev = Lake(s, dir).events
          .withColumn("t", expr("ts DIV 1000")) // epoch-micros, matches oracle
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id", "t").agg(max("event_id").as("purchase_id"))
        AsOfJoin.asOfBackward(
            ev.select("event_id", "user_id", "t"), purchases,
            keys = Seq("user_id"), leftTime = "t", rightTime = "t")
          .select(col("event_id"), col("user_id"),
            col("asof_purchase_id").as("prior_purchase_id"))
          .orderBy("event_id")
      },
      Some(
        """WITH p AS (
          |  SELECT user_id, ts, max(event_id) AS purchase_id
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
          |SELECT e.event_id, e.user_id, p.purchase_id AS prior_purchase_id
          |FROM events e ASOF LEFT JOIN p
          |  ON e.user_id = p.user_id AND e.ts >= p.ts
          |ORDER BY e.event_id""".stripMargin),
      headline = true),

    // ---- as-of join with a bounded lookback window ----------------------
    // Same single-shuffle carry-forward plan; matches older than 30
    // minutes are nulled by the tolerance gate (purchases "expire").
    "a2_asof_tolerance" -> Q(
      (s, dir) => {
        val ev = Lake(s, dir).events
          .withColumn("t", expr("ts DIV 1000")) // epoch-micros, matches oracle
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id", "t").agg(max("event_id").as("purchase_id"))
        AsOfJoin.asOfBackward(
            ev.select("event_id", "user_id", "t"), purchases,
            keys = Seq("user_id"), leftTime = "t", rightTime = "t",
            tolerance = Some(lit(30L * 60 * 1000000))) // 30 min in micros
          .select(col("event_id"), col("user_id"),
            col("asof_purchase_id").as("recent_purchase_id"))
          .orderBy("event_id")
      },
      Some(
        """WITH p AS (
          |  SELECT user_id, ts, max(event_id) AS purchase_id
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
          |SELECT e.event_id, e.user_id,
          |  CASE WHEN e.ts - p.ts <= INTERVAL '30 minutes'
          |       THEN p.purchase_id END AS recent_purchase_id
          |FROM events e ASOF LEFT JOIN p
          |  ON e.user_id = p.user_id AND e.ts >= p.ts
          |ORDER BY e.event_id""".stripMargin)),

    // ---- banded range join: |c_acctbal - s_acctbal| <= 10 ---------------
    "r1_range_join" -> Q(
      (s, dir) => {
        val lk = Lake(s, dir)
        RangeJoin.binnedRangeJoin(lk.customer, lk.supplier,
            "c_acctbal", "s_acctbal", width = 10.0)
          .select("c_custkey", "s_suppkey")
          .orderBy("c_custkey", "s_suppkey")
      },
      Some(
        """SELECT c_custkey, s_suppkey
          |FROM customer JOIN supplier ON abs(c_acctbal - s_acctbal) <= 10
          |ORDER BY c_custkey, s_suppkey""".stripMargin)),

    // ---- runtime Bloom-filter join pruning ------------------------------
    // The explicit runtime-filter shape: a 64 Kbit / 3-hash Bloom filter
    // over the selective dim subset's keys pre-filters the fact scan
    // before the join. The oracle is the PLAIN exact join — identical
    // output is the operator's contract (a false negative would drop a
    // row and fail the hash gate; false positives die in the exact join).
    "q45_bloom_join" -> Q(
      (s, dir) => {
        val lk = Lake(s, dir)
        val dim = lk.part.where(col("p_size") >= 48)
          .select("p_partkey", "p_brand")
        RuntimeFilter.bloomJoin(lk.lineitem, "l_partkey", dim, "p_partkey")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
                (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
              .cast(DoubleType).as("revenue"))
          .orderBy("p_brand")
      },
      Some(
        """SELECT p_brand, count(*) AS n_items,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_size >= 48
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import util._

/** Compound headline queries — multi-operator pipelines shaped like the
  * classic TPC-H workloads, exercising scan→filter→join→agg→sort/topk
  * end to end through one plan (the shapes the optimizer must get right
  * together, not in isolation).
  */
object Headline {

  /** Q3-shaped: segment filter → 3-way join → grouped revenue → top 10.
    * Plan shape to verify at scale: customer filter pushed to scan,
    * broadcast or shuffled joins by size, partial agg before the final
    * TakeOrderedAndProject.
    */
  val qHeadlineShipping: Q = (s, d) => {
    val dec = DecimalType(18, 2)
    Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate"))
      .groupBy("o_orderkey")
      .agg(sum(col("l_extendedprice").cast(dec) *
               (lit(1).cast(dec) - col("l_discount").cast(dec)))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val qHeadlineShippingSql: String =
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Q5-shaped: 5-way star join with a date band → revenue per nation. */
  val qHeadlineLocalRevenue: Q = (s, d) => {
    val dec = DecimalType(18, 2)
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("l_extendedprice").cast(dec) *
               (lit(1).cast(dec) - col("l_discount").cast(dec)))
             .cast("double").as("revenue"))
      .orderBy(col("r_name").asc, col("revenue").desc, col("n_name").asc)
  }

  val qHeadlineLocalRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name ASC, revenue DESC, n_name ASC""".stripMargin

  /** Sketch-based profile: approx distinct + approx quantiles — the
    * 100 TB substitutes for their exact forms. Sketch OUTPUTS are
    * implementation-defined (HLL++ register layout, QuantileSummaries
    * merge order), so the gate can't hash them directly; instead the
    * query re-checks each estimate against the data and emits a
    * boolean "within the guaranteed error", which the DuckDB oracle
    * pins to TRUE alongside the exact anchors (hash-compared). Same
    * tolerance-oracle pattern as `q_agg_quantile_sketch`: a sketch
    * regression (bad merge, off-by-rank) flips a boolean and fails the
    * gate. `approx_count_distinct` at rsd 0.02 is checked at 3σ = 6%;
    * `percentile_approx` at accuracy 1000 (rank error ≤ 1/1000) is
    * re-ranked at 2x slack. One extra aggregation pass, both mergeable
    * — still the one-pass 100 TB shape.
    */
  val qAggApprox: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val sk = li.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("ad"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("ap"),
      count(lit(1)).as("cnt"))
    li.join(broadcast(sk), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        first(col("cnt")).as("cnt"),
        first(col("ad")).as("ad"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        sum(when(col("l_extendedprice") <= col("ap"), 1L).otherwise(0L))
          .as("le50"),
        sum(when(col("l_extendedprice") < col("ap"), 1L).otherwise(0L))
          .as("lt50"))
      .select(
        col("l_returnflag"), col("cnt"), col("exact_orders"),
        (abs(col("ad") - col("exact_orders")).cast("double") /
          col("exact_orders") <= lit(0.06)).as("ok_distinct"),
        (col("lt50") / col("cnt") <= lit(0.5) + lit(0.002) &&
          col("le50") / col("cnt") >= lit(0.5) - lit(0.002)).as("ok_p50"))
      .orderBy("l_returnflag")
  }

  val qAggApproxSql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS ok_distinct, TRUE AS ok_p50
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_headline_shipping" -> qHeadlineShipping,
    "q_headline_local_revenue" -> qHeadlineLocalRevenue,
    "q_agg_approx" -> qAggApprox
  )

  val oracles: Map[String, String] = Map(
    "q_headline_shipping" -> qHeadlineShippingSql,
    "q_headline_local_revenue" -> qHeadlineLocalRevenueSql,
    "q_agg_approx" -> qAggApproxSql
  )
}

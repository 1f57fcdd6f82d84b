package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import util._

/** Queries exercising the extension surface (SURVEY.md §2.4): SQL-
  * registered codec UDFs and the typed-Aggregator UDAF.
  */
object Extensions {

  /** Custom UDAF in the hash-compare gate: decimal-exact weighted
    * average via a typed Aggregator — runs partial+final like a builtin.
    */
  val qUdafWeightedAvg: Q = (s, d) => {
    GraftFunctions.register(s)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("graft_weighted_avg(l_extendedprice, l_quantity)")
             .as("wavg_price"),
           count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  val qUdafWeightedAvgSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Domain codecs as SQL functions (rows-only: DuckDB has no mahjong
    * codecs; the codec logic itself is oracled by CodecsSpec).
    * Every output column is scalar — array results are rendered via
    * array_join so the driver's pandas sort can hash the rows.
    */
  val qUdfTiles: Q = (s, d) => {
    GraftFunctions.register(s)
    Tables.lineitem(s, d)
      .where(pmod(col("l_orderkey"), lit(50)) === 0)
      .selectExpr(
        "l_orderkey", "l_linenumber",
        "graft_tiles(array(CAST(pmod(l_orderkey, 136) AS INT), " +
          "CAST(pmod(l_partkey, 136) AS INT), " +
          "CAST(pmod(l_suppkey, 136) AS INT)), true) AS tiles",
        "array_join(graft_dora(array(CAST(pmod(l_partkey, 136) AS INT))), ',') AS dora",
        "graft_meld_pais(CAST(pmod(l_orderkey * 31, 65536) AS INT), true) AS meld",
        "graft_meld_type(CAST(pmod(l_orderkey * 31, 65536) AS INT), true) AS meld_type")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val entries: Map[String, Q] = Map(
    "q_udaf_weighted_avg" -> qUdafWeightedAvg,
    "q_udf_tiles"         -> qUdfTiles
  )

  val oracles: Map[String, String] = Map(
    "q_udaf_weighted_avg" -> qUdafWeightedAvgSql
  )
}

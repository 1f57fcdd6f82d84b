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

  /** Domain codecs as SQL functions. Every output column is scalar —
    * array results are rendered via array_join so the driver's pandas
    * sort can hash the rows.
    *
    * Oracled cross-engine: the tile render, dora-indicator step and the
    * full 16-bit Tenhou meld decode (chi / pon / added-kan / closed-kan
    * branches, aka-five placement, from-who marks, nuki → NULL) are
    * re-derived in pure DuckDB SQL from the same spec
    * (scrape.py:204-352) — an independent second implementation, so a
    * hash-pass checks the Scala codec against the spec rather than
    * against itself. CodecsSpec still carries the exhaustive 2^16
    * decode and golden fixtures.
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
      // (l_orderkey, l_linenumber) is not unique in the synthetic
      // lineitem — tiles/dora break the remaining ties
      .orderBy("l_orderkey", "l_linenumber", "tiles", "dora")
  }

  /** DuckDB re-derivation of all four codec columns. Branch order and
    * bit fields mirror Melds.decode exactly; `%`/`//`/`&`/`>>` on the
    * (always-positive) keys match Spark's pmod/shift semantics. Every
    * column is a scalar per-row expression — (l_orderkey, l_linenumber)
    * is NOT unique in the synthetic lineitem, so any unnest + re-join
    * on that key would cross-multiply duplicate keys.
    */
  val qUdfTilesSql: String =
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(l_orderkey % 136 AS INT) AS t0,
      |         CAST(l_partkey  % 136 AS INT) AS t1,
      |         CAST(l_suppkey  % 136 AS INT) AS t2,
      |         CAST((l_orderkey * 31) % 65536 AS INT) AS m
      |  FROM lineitem WHERE l_orderkey % 50 = 0
      |), b1 AS (
      |  SELECT *,
      |         list_sort([t0, t1, t2])[1] AS a1,
      |         list_sort([t0, t1, t2])[2] AS a2,
      |         list_sort([t0, t1, t2])[3] AS a3,
      |         ['', '+', '=', '-'][(m % 4) + 1] AS dd
      |  FROM base
      |), b2 AS (
      |  SELECT *,
      |         a1 // 36 AS s1, a2 // 36 AS s2, a3 // 36 AS s3,
      |         (a1 % 36) // 4 AS q1, (a2 % 36) // 4 AS q2, (a3 % 36) // 4 AS q3,
      |         a1 % 4 AS cp1, a2 % 4 AS cp2, a3 % 4 AS cp3,
      |         ((m & 64512) // 1024) % 3 AS chi_r,
      |         (((m & 64512) // 1024) // 3) // 7 AS chi_suit,
      |         ((((m & 64512) // 1024) // 3) % 7) + 1 AS chi_n,
      |         (m & 24) // 8 AS c0, (m & 96) // 32 AS c1, (m & 384) // 128 AS c2,
      |         ((m & 65024) // 512) % 3 AS pk_r,
      |         (((m & 65024) // 512) // 3) // 9 AS pk_suit,
      |         ((((m & 65024) // 512) // 3) % 9) + 1 AS pk_n,
      |         (m & 96) // 32 AS unused,
      |         (m // 256) % 4 AS kn_r,
      |         ((m // 256) // 4) // 9 AS kn_suit,
      |         (((m // 256) // 4) % 9) + 1 AS kn_n
      |  FROM b1
      |), b3 AS (
      |  SELECT *,
      |         pk_suit <> 3 AND pk_n = 5 AS pk_aka,
      |         kn_suit <> 3 AND kn_n = 5 AS kn_aka,
      |         ['m','p','s','z'][s1 + 1] ||
      |         (CASE WHEN s1 <> 3 AND q1 = 4 AND cp1 = 0 THEN '0'
      |               ELSE CAST(q1 + 1 AS VARCHAR) END) ||
      |         (CASE WHEN s2 <> s1 THEN ['m','p','s','z'][s2 + 1] ELSE '' END) ||
      |         (CASE WHEN s2 <> 3 AND q2 = 4 AND cp2 = 0 THEN '0'
      |               ELSE CAST(q2 + 1 AS VARCHAR) END) ||
      |         (CASE WHEN s3 <> s2 THEN ['m','p','s','z'][s3 + 1] ELSE '' END) ||
      |         (CASE WHEN s3 <> 3 AND q3 = 4 AND cp3 = 0 THEN '0'
      |               ELSE CAST(q3 + 1 AS VARCHAR) END) AS tiles,
      |         CAST((t1 // 36) * 36 +
      |           (CASE WHEN t1 // 36 = 3 THEN
      |              CASE ((t1 % 36) // 4) + 1 WHEN 4 THEN 0 WHEN 7 THEN 4
      |                   ELSE ((t1 % 36) // 4) + 1 END
      |            ELSE
      |              CASE WHEN ((t1 % 36) // 4) + 1 >= 9 THEN 0
      |                   ELSE ((t1 % 36) // 4) + 1 END
      |            END) * 4 + (t1 % 4) AS VARCHAR) AS dora
      |  FROM b2
      |), b4 AS (
      |  SELECT *,
      |    CASE
      |      WHEN (m & 4) <> 0 THEN
      |        ['m','p','s','z'][chi_suit + 1] ||
      |        (CASE WHEN c0 = 0 AND chi_n = 5 THEN '0'
      |              ELSE CAST(chi_n AS VARCHAR) END) ||
      |        (CASE WHEN chi_r = 0 THEN dd ELSE '' END) ||
      |        (CASE WHEN c1 = 0 AND chi_n + 1 = 5 THEN '0'
      |              ELSE CAST(chi_n + 1 AS VARCHAR) END) ||
      |        (CASE WHEN chi_r = 1 THEN dd ELSE '' END) ||
      |        (CASE WHEN c2 = 0 AND chi_n + 2 = 5 THEN '0'
      |              ELSE CAST(chi_n + 2 AS VARCHAR) END) ||
      |        (CASE WHEN chi_r = 2 THEN dd ELSE '' END)
      |      WHEN (m & 24) <> 0 THEN
      |        CASE WHEN pk_suit > 3 THEN NULL ELSE
      |          ['m','p','s','z'][pk_suit + 1] ||
      |          CAST(pk_n AS VARCHAR) ||
      |          (CASE WHEN pk_aka AND unused <> 0 AND pk_r <> 0 THEN '0'
      |                ELSE CAST(pk_n AS VARCHAR) END) ||
      |          (CASE WHEN pk_aka AND unused <> 0 AND pk_r = 0 THEN '0'
      |                ELSE CAST(pk_n AS VARCHAR) END) ||
      |          dd ||
      |          (CASE WHEN (m & 8) <> 0 THEN ''
      |                WHEN pk_aka AND unused = 0 THEN '0'
      |                ELSE CAST(pk_n AS VARCHAR) END)
      |        END
      |      WHEN (m & 48) = 0 THEN
      |        CASE WHEN kn_suit > 3 THEN NULL ELSE
      |          ['m','p','s','z'][kn_suit + 1] ||
      |          CAST(kn_n AS VARCHAR) || CAST(kn_n AS VARCHAR) ||
      |          (CASE WHEN kn_aka AND NOT (dd = '' OR kn_r = 0) THEN '0'
      |                ELSE CAST(kn_n AS VARCHAR) END) ||
      |          (CASE WHEN kn_aka AND (dd = '' OR kn_r = 0) THEN '0'
      |                ELSE CAST(kn_n AS VARCHAR) END) ||
      |          dd
      |        END
      |      ELSE NULL
      |    END AS meld,
      |    CASE
      |      WHEN (m & 4) <> 0 THEN 'tii'
      |      WHEN (m & 24) <> 0 THEN
      |        CASE WHEN pk_suit > 3 THEN NULL
      |             WHEN (m & 8) <> 0 THEN 'pon' ELSE 'kan' END
      |      WHEN (m & 48) = 0 THEN
      |        CASE WHEN kn_suit > 3 THEN NULL ELSE 'kan' END
      |      ELSE NULL
      |    END AS meld_type
      |  FROM b3
      |)
      |SELECT l_orderkey, l_linenumber, tiles, dora, meld, meld_type
      |FROM b4 ORDER BY l_orderkey, l_linenumber, tiles, dora""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_udaf_weighted_avg" -> qUdafWeightedAvg,
    "q_udf_tiles"         -> qUdfTiles
  )

  val oracles: Map[String, String] = Map(
    "q_udaf_weighted_avg" -> qUdafWeightedAvgSql,
    "q_udf_tiles"         -> qUdfTilesSql
  )
}

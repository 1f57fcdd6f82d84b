package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object util {
  /** Signature of every driver-visible query: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Hash-stable SUM of a 2-decimal double column.
    *
    * Summing raw doubles is order-dependent (fp addition is not
    * associative) and Spark's partial aggregation order differs run to
    * run — at sf0.1 the drift is large enough to flip `round(x, 2)` at a
    * boundary. Casting to DECIMAL first makes the sum exact and
    * engine-independent; the final cast back to double is a single
    * well-defined nearest conversion, so Spark and DuckDB produce
    * bit-identical results. Decimal aggregation is still map-side
    * partial + final (HashAggregateExec), so this costs nothing at scale.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same exactness trick for a 2-decimal AVG: exact decimal sum divided
    * by the group count — one IEEE division on identical operands in
    * both engines.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB SQL spelling of [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  def davgSql(col: String): String = s"(${dsumSql(col)} / COUNT(*))"
}

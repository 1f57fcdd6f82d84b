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

/** Wall-clock registry of the once-per-(session, dir) artifact builds —
  * seeded scan/layout dirs, the streaming week files, the memoized
  * dedup/graph chains. Their cost is deliberately excluded from the
  * per-query medians (they are once-per-dir, like a table load, so the
  * medians report marginal query cost), which made it invisible in
  * `bench_out.json`: the suite total understated what a COLD run pays.
  * Every seed site wraps its build in [[Seeds.timed]], and Bench emits
  * the accumulated `seed_sec` total plus a per-artifact breakdown, so
  * suite total + seed_sec ≈ cold-run cost and the accounting is
  * auditable.
  */
object Seeds {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]
  private val accMeasured =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]

  /** True while Bench's TIMED reps are running. A seed that fires then
    * lands in that rep's wall clock AND in seed_sec, so "suite total +
    * seed_sec ≈ cold run" would double-count it; tracking the phase
    * lets Bench report the overlap (`seed_sec_in_reps`) so the two
    * totals compose without guesswork.
    */
  @volatile private var measuredPhase = false

  def beginMeasured(): Unit = measuredPhase = true

  def timed[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val inMeasured = measuredPhase
    try body
    finally {
      val sec = java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9)
      val add = (a: java.lang.Double, b: java.lang.Double) =>
        java.lang.Double.valueOf(a.doubleValue + b.doubleValue)
      acc.merge(name, sec, (a, b) => add(a, b))
      if (inMeasured) accMeasured.merge(name, sec, (a, b) => add(a, b))
    }
  }

  def breakdown: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }

  def totalSec: Double = breakdown.values.sum

  /** Portion of [[totalSec]] accrued inside a measured bench rep. */
  def measuredSec: Double = {
    import scala.jdk.CollectionConverters._
    accMeasured.asScala.values.map(_.doubleValue).sum
  }
}

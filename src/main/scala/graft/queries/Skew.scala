package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import util._

/** Skew mitigation for equi-joins (SCALE.md "Joins"): when a handful of
  * hot keys dominate (the `events.user_id` shape — 15 distinct values),
  * a plain shuffle puts each hot key on one reducer. Salting fans each
  * probe-side row to one of `salts` sub-keys and replicates the build
  * side across all of them, spreading a hot key over `salts` reducers.
  *
  * AQE's skew-join split handles *sort-merge* skew automatically; this
  * utility is for the cases AQE can't fix (aggregate-before-join shapes,
  * deliberate repartitioning, state-keyed streams).
  */
object Skew {

  /** Random-but-seeded salt in [0, salts). Any distribution works —
    * correctness never depends on which salt a row gets, only that the
    * build side covers all of them.
    */
  private def saltCol(salts: Int, seed: Long): Column =
    (rand(seed) * salts).cast("int")

  /** Salted inner equi-join: `probe` (large, skewed on probeKey) ⋈
    * `build` (replicated `salts`×). Result equals the plain join.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val p = probe.withColumn("__salt", saltCol(salts, seed))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, p("__salt") === b("__salt") &&
              col(probeKey) === col(buildKey))
      .drop("__salt")
  }

  /** Salted two-phase aggregation: groupBy(key) where few keys carry
    * most rows. Phase 1 aggregates (key, salt) partials; phase 2 merges
    * per key — the hot key's rows spread over `salts` reducers first.
    * Caller supplies partial and final agg expressions that compose
    * (e.g. sum→sum, count→sum).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__salt", saltCol(salts, seed))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Gate entry: salted join on the deliberately skewed key. `events`
    * has 15 distinct `user_id` values over all its rows — the worst
    * case for a plain shuffle join (15 reducers do all the work). The
    * salted plan spreads each hot key over 8 sub-keys; the result is
    * identical to the plain join, which is exactly what the DuckDB
    * oracle runs.
    */
  val qJoinSkew: Q = (s, d) => {
    val events = Tables.events(s, d)
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    saltedJoin(events, cust, "user_id", "c_custkey", salts = 8)
      .groupBy(col("user_id"), col("c_name"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val qJoinSkewSql: String =
    """SELECT e.user_id, c.c_name, COUNT(*) AS n_events
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY e.user_id, c.c_name
      |ORDER BY e.user_id""".stripMargin

  val entries: Map[String, Q] = Map("q_join_skew" -> qJoinSkew)
  val oracles: Map[String, String] = Map("q_join_skew" -> qJoinSkewSql)
}

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

  /** Gate entry: salted TWO-PHASE aggregation on the skewed key.
    * `events` concentrates all rows on 5 `event_type` values — a plain
    * groupBy gives 5 reducers all the work. Phase 1 aggregates
    * (key, salt∈[0,64)) partials (map-side combine still applies);
    * phase 2 merges 64 partial rows per key. Counts add and decimal
    * sums add exactly, so the result is bit-identical to the plain
    * aggregate the oracle runs. At 100 TB this (plus AQE skew
    * handling) is the standard hot-key aggregation shape: the first
    * exchange spreads each hot key over 64 reducers, the second
    * touches |keys|×64 rows.
    */
  val qAggSalted: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("__salt", saltCol(64, 7L))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)))
          .as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        sum(col("ps")).cast("double").as("total_value"))
      .orderBy("event_type")

  val qAggSaltedSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_join_skew" -> qJoinSkew,
    "q_agg_salted" -> qAggSalted)
  val oracles: Map[String, String] = Map(
    "q_join_skew" -> qJoinSkewSql,
    "q_agg_salted" -> qAggSaltedSql)
}

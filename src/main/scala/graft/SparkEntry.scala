package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Curation, Extensions, Funcs, Headline,
  Insights, LlmOps, MahjongAnalytics, Maintain, Multimodal, Quality,
  Relational, Signals, Skew, StreamingQ, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the t2 correctness inventory (SURVEY.md §2.3): one entry
  * per declared operator; `oracleSql` carries the DuckDB-equivalent SQL
  * for every hash-comparable entry. Keys without an oracle (streaming
  * semantics, LSH candidates, ANN) get a rows-only check here and full
  * assertions in the ScalaTest suite.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped scan→agg→sort through the full Catalyst stack.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.entries ++ Windows.entries ++ Funcs.entries ++
      LlmOps.entries ++ StreamingQ.entries ++ Multimodal.entries ++
      Extensions.entries ++ Headline.entries ++ Skew.entries ++
      Analytics.entries ++ Curation.entries ++ Insights.entries ++
      Maintain.entries ++ Quality.entries ++ MahjongAnalytics.entries ++
      Signals.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Windows.oracles ++ Funcs.oracles ++
      LlmOps.oracles ++ StreamingQ.oracles ++ Multimodal.oracles ++
      Extensions.oracles ++ Headline.oracles ++ Skew.oracles ++
      Analytics.oracles ++ Curation.oracles ++ Insights.oracles ++
      Maintain.oracles ++ Quality.oracles ++ MahjongAnalytics.oracles ++
      Signals.oracles
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import util.Q

/** The reference's *actual* analytics workload: the Athena queries a
  * mahjong-etl user runs over the 9-table star schema (SURVEY.md §2.3
  * preamble — win-rate by rule, yaku frequency, score progression,
  * action sequences, player rankings). The reference ships zero SQL
  * (README.md:2 delegates to Athena); these are those workloads
  * expressed over OUR parsed tables, so a reference user can port their
  * queries 1:1.
  *
  * Input: `tablesDir` = output of Pipeline.run / StreamingPipeline.
  * Exercised in MahjongAnalyticsSpec over the fixture games; at scale
  * these run over the dt-partitioned lake with the same code.
  */
object MahjongAnalytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name")

  /** Win rate (agari share of kyokus) per rule flag — the "win-rate by
    * rule" pattern: games ⋈ rules ⋈ kyokus ⟕ agaris.
    */
  def winRateByRule(spark: SparkSession, dir: String): DataFrame = {
    val kyokus = t(spark, dir, "kyokus").select(col("id"), col("game_id"))
    val agaris = t(spark, dir, "agaris").select(col("kyoku_id")).distinct()
    val rules = t(spark, dir, "rules")
      .select(col("game_id"), col("is_sanma"), col("aka_type"), col("level"))
    kyokus
      .join(broadcast(rules), "game_id")
      .join(agaris, kyokus("id") === agaris("kyoku_id"), "left")
      .groupBy("is_sanma", "aka_type", "level")
      .agg(count(lit(1)).as("kyokus"),
           count(col("kyoku_id")).as("wins"),
           round(count(col("kyoku_id")) / count(lit(1)).cast("double"), 4)
             .as("win_rate"))
      .orderBy("is_sanma", "aka_type", "level")
  }

  /** Yaku frequency: explode agaris.yaku list<struct>. */
  def yakuFrequency(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "agaris")
      .select(explode(col("yaku")).as("y"))
      .groupBy(col("y.name").as("yaku"))
      .agg(count(lit(1)).as("times"), sum(col("y.han")).as("total_han"))
      .orderBy(col("times").desc, col("yaku"))

  /** Score progression per game: running seat scores over ordered
    * kyokus via window + agari score diffs.
    */
  def scoreProgression(spark: SparkSession, dir: String): DataFrame = {
    val k = t(spark, dir, "kyokus")
    val diffs = t(spark, dir, "agaris")
      .select(col("kyoku_id"), col("score_diff"))
      .unionByName(t(spark, dir, "nagares").select(col("kyoku_id"), col("score_diff")))
    val w = Window.partitionBy("game_id").orderBy("id")
    k.join(diffs, k("id") === diffs("kyoku_id"), "left")
      .select(col("game_id"), col("id"),
              posexplode(coalesce(col("score_diff"),
                array(lit(0), lit(0), lit(0), lit(0)))))
      .withColumnRenamed("pos", "player_index")
      .withColumnRenamed("col", "diff")
      .withColumn("running_diff",
        sum(col("diff")).over(
          Window.partitionBy("game_id", "player_index").orderBy("id")))
      .orderBy("game_id", "id", "player_index")
  }

  /** Action sequences: per-kyoku ordered event stream with previous
    * action type (lag over seq — the reference's actions.seq ordering).
    */
  def actionSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("kyoku_id").orderBy("seq")
    t(spark, dir, "actions")
      .select(col("kyoku_id"), col("seq"), col("player_index"),
              col("type"), col("pais"),
              lag(col("type"), 1).over(w).as("prev_type"))
      .orderBy("kyoku_id", "seq")
  }

  /** Player ranking by end-of-game points (game_scores.point desc),
    * rank within each game plus cross-game leaderboard.
    */
  def playerRanking(spark: SparkSession, dir: String): DataFrame = {
    val scores = t(spark, dir, "game_scores")
    val players = t(spark, dir, "game_players")
    val perGame = Window.partitionBy("game_id")
      .orderBy(col("point").desc, col("player_index").asc)
    scores
      .join(players, Seq("game_id", "player_index"))
      .withColumn("place", row_number().over(perGame))
      .groupBy("player_name")
      .agg(count(lit(1)).as("games"),
           sum(col("point")).as("total_points"),
           sum(when(col("place") === 1, 1L).otherwise(0L)).as("firsts"),
           round(avg(col("place")), 4).as("avg_place"))
      .orderBy(col("total_points").desc, col("player_name"))
  }

  /** Riichi success: riichi declarations (actions with the `*` marker)
    * joined to whether that player won the kyoku.
    */
  def riichiOutcomes(spark: SparkSession, dir: String): DataFrame = {
    val riichis = t(spark, dir, "actions")
      .where(col("type") === "sutehai" && col("pais").endsWith("*"))
      .select(col("kyoku_id"), col("player_index"))
    val wins = t(spark, dir, "agaris")
      .select(col("kyoku_id"), col("who").as("player_index"), lit(1L).as("won"))
    riichis.join(wins, Seq("kyoku_id", "player_index"), "left")
      .groupBy("player_index")
      .agg(count(lit(1)).as("riichis"),
           sum(coalesce(col("won"), lit(0L))).as("riichi_wins"))
      .orderBy("player_index")
  }

  // ---------------------------------------------------------------
  // q_mahjong_yaku_freq — the hash gate over the ETL's OWN output.
  // ---------------------------------------------------------------

  /** Seed a deterministic mjlog corpus (LogGen, fixed seed) and run the
    * FULL batch pipeline over it, once per (session, data dir). Returns
    * the 9-table output dir. Before r16 the ETL output was contract-
    * and referential-integrity-tested (TablesContractSpec) but never
    * cross-engine-hashed; this closes that seam — the gate key below
    * reads the pipeline's parquet back and DuckDB reads the SAME files.
    */
  private[graft] def etlTablesDir(spark: SparkSession, d: String): String = {
    val logs = Relational.scratchDir("mjgate_logs", d)
    val out = Scratch.path("mjgate_tables", d)
    val seeded = java.nio.file.Paths.get(out, "_SEEDED")
    this.synchronized {
      if (!java.nio.file.Files.exists(seeded)) Seeds.timed("mjgate_etl") {
        graft.etl.LogGen.main(Array(logs, "3", "30", "20260816"))
        graft.etl.Pipeline.run(spark, logs, out)
        java.nio.file.Files.createFile(seeded)
      }
    }
    out
  }

  /** Yaku frequency over the pipeline's own `agaris` table — the
    * reference's list-of-struct `agaris.yaku` schema
    * (`scrape.py:91-101`) read back from the dt-partitioned lake the
    * ETL just wrote: explode the yaku list, count + total han per yaku
    * name. The DuckDB oracle UNNESTs the exact same parquet files, so
    * the gate now pins parser semantics + encode + partitioned sink +
    * scan end-to-end, not just the query layer over driver testdata.
    *
    * At 100 TB: the input is the lake itself (dt-partitioned, pruned
    * scan); explode + one combining aggregate on a bounded key domain
    * (the ~50-entry yaku table) — partials collapse map-side.
    */
  val qMahjongYakuFreq: Q = (s, d) => {
    val dir = etlTablesDir(s, d)
    s.read.parquet(s"$dir/agaris")
      .select(explode(col("yaku")).as("y"))
      .groupBy(col("y.name").as("yaku"))
      .agg(count(lit(1)).as("times"),
           sum(col("y.han")).as("total_han"))
      .orderBy(col("times").desc, col("yaku"))
  }

  val qMahjongYakuFreqSql: String =
    s"""SELECT y.name AS yaku, count(*) AS times,
       |  CAST(sum(y.han) AS BIGINT) AS total_han
       |FROM (SELECT UNNEST(yaku) AS y
       |      FROM '${Scratch.sqlPath("mjgate_tables")}/agaris/*/*.parquet')
       |GROUP BY 1 ORDER BY times DESC, yaku""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_mahjong_yaku_freq" -> qMahjongYakuFreq)

  val oracles: Map[String, String] = Map(
    "q_mahjong_yaku_freq" -> qMahjongYakuFreqSql)
}

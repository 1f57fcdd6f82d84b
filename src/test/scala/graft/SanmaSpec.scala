package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipeline

/** Golden coverage for the reference's partial 3-player (sanma) path
  * (scrape.py:466-471): GO bit4 rule flags, empty `hai3`/`n3`,
  * nuki-dora melds (`Melds.decode` → None, counted on the AGARI —
  * scrape.py:507-508), and 4-seat score arrays with a zeroed 4th seat.
  * Asserts the sanma fixture through all 9 tables.
  */
class SanmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val gameId = "2024010300gm-0004"

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    val logDir = getClass.getResource("/mjlog").getPath
    Pipeline.tables(spark, Pipeline.parseLogs(spark, logDir))
  }
  private def t(name: String) = tables(name)
  private val kyokuIds = java.time.LocalDate.of(2024, 1, 3).toEpochDay * 100000L

  test("games: sanma flag set, tonpu, aka") {
    val g = t("games").where(col("id") === gameId).collect()
    assert(g.length == 1)
    val r = g.head
    assert(r.getAs[Boolean]("sanma"))
    assert(r.getAs[Boolean]("tonpu"))
    assert(r.getAs[Boolean]("has_aka"))
    assert(!r.getAs[Boolean]("demo"))
  }

  test("rules: sanma initial score 35000") {
    val r = t("rules").where(col("game_id") === gameId).collect().head
    assert(r.getAs[Boolean]("is_sanma"))
    assert(r.getAs[Int]("initial_score") == 35000)
  }

  test("game_players: 4 seats, empty 4th name (reference keeps n3='')") {
    val names = t("game_players").where(col("game_id") === gameId)
      .orderBy("player_index").select("player_name")
      .collect().map(_.getString(0))
    assert(names.toSeq == Seq("北", "南", "西", ""))
  }

  test("game_scores: 4 rows with a zeroed 4th seat") {
    val rows = t("game_scores").where(col("game_id") === gameId)
      .orderBy("player_index")
      .collect().map(r => (r.getAs[Int]("score"),
                           r.getAs[java.math.BigDecimal]("point").toPlainString))
    assert(rows.toSeq == Seq((33000, "-17.0"), (32000, "3.0"),
                             (39100, "14.0"), (0, "0.0")))
  }

  test("kyokus: scores carry the zeroed 4th seat") {
    val ks = t("kyokus").where(col("game_id") === gameId)
      .orderBy("id").collect()
    assert(ks.length == 2)
    assert(ks.map(_.getAs[Long]("id")).toSeq ==
      Seq(kyokuIds, kyokuIds + 1))
    assert(ks.head.getAs[collection.Seq[Int]]("scores").toSeq == Seq(35000, 35000, 35000, 0))
  }

  test("haipais: exactly 3 seats per kyoku — empty hai3 skipped") {
    val h = t("haipais")
      .where(col("kyoku_id").isin(kyokuIds, kyokuIds + 1))
      .groupBy("kyoku_id").agg(collect_set("player_index").as("seats"))
      .collect()
    assert(h.length == 2)
    h.foreach(r => assert(r.getAs[collection.Seq[Int]]("seats").toSeq.sorted == Seq(0, 1, 2)))
  }

  test("actions: nuki N events emit no meld rows; pon does") {
    val a1 = t("actions").where(col("kyoku_id") === kyokuIds)
      .orderBy("seq").collect()
    // kyoku 1: T52,D52,U53,E53,V121(draw),<nuki: no row>,V54,F54,pon
    assert(a1.map(_.getAs[String]("type")).toSeq ==
      Seq("tsumo", "sutehai", "tsumo", "sutehai", "tsumo",
          "tsumo", "sutehai", "pon"))
    val pon = a1.last
    assert(pon.getAs[Int]("player_index") == 1)
    assert(pon.getAs[String]("pais") == "z333=")
  }

  test("agaris: nukidora counted from undecodable melds") {
    val ag = t("agaris").where(col("kyoku_id") === kyokuIds + 1)
      .collect().head
    assert(ag.getAs[Int]("nukidora") == 2)
    assert(ag.getAs[Int]("who") == 2 && ag.getAs[Int]("by") == 2)
    assert(ag.getAs[Int]("han") == 3 && ag.getAs[Int]("fu") == 30)
    assert(ag.getAs[collection.Seq[Int]]("score_diff").toSeq == Seq(-2000, -2000, 4100, 0))
    assert(ag.getAs[Boolean]("owari"))
  }

  test("nagares: ryuukyoku with 4-seat zeroed diff") {
    val ng = t("nagares").where(col("kyoku_id") === kyokuIds).collect().head
    assert(ng.getAs[String]("name") == "流局")
    assert(ng.getAs[collection.Seq[Int]]("score_diff").toSeq == Seq(0, 0, 0, 0))
  }
}

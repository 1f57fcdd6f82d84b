package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipeline

/** End-to-end ETL test (SURVEY.md §5.2.5): fixture XML dir → full
  * pipeline → read back all 9 tables → schema, id-scheme and
  * referential-integrity checks.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val outDir: String = {
    val logDir = getClass.getResource("/mjlog").getPath
    val out = Files.createTempDirectory("graft_etl_").toString
    Pipeline.run(spark, logDir, out)
    out
  }

  private def table(name: String) = spark.read.parquet(s"$outDir/$name")

  test("all 9 tables written with expected row counts") {
    assert(table("games").count() == 4)
    assert(table("rules").count() == 4)
    assert(table("game_players").count() == 15) // 4 + 4 + 3 + 4 (sanma n3="")
    assert(table("game_scores").count() == 12)  // 3 games ended
    assert(table("kyokus").count() == 6)
    assert(table("haipais").count() == 21)      // 4 + (4+4) + 3 + (3+3 sanma)
    assert(table("nagares").count() == 3)
    assert(table("agaris").count() == 3)
    assert(table("actions").count() > 10)
  }

  test("hive partitioning by dt") {
    assert(Files.exists(Paths.get(s"$outDir/games/dt=2024-01-01")))
    assert(Files.exists(Paths.get(s"$outDir/games/dt=2024-01-02")))
    assert(Files.exists(Paths.get(s"$outDir/games/dt=2024-01-03")))
    assert(table("games").select("dt").distinct().count() == 3)
  }

  test("kyoku ids follow days*100000 + seq per date, deterministically") {
    val ids = table("kyokus").where(col("dt") === "2024-01-01")
      .orderBy("id").select("id").collect().map(_.getLong(0))
    val days = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    assert(ids.toSeq == Seq(days * 100000L, days * 100000L + 1,
                            days * 100000L + 2))
    // re-running yields identical ids (determinism under parallelism)
    val out2 = Files.createTempDirectory("graft_etl2_").toString
    Pipeline.run(spark, getClass.getResource("/mjlog").getPath, out2)
    val ids2 = spark.read.parquet(s"$out2/kyokus")
      .where(col("dt") === "2024-01-01")
      .orderBy("id").select("id").collect().map(_.getLong(0))
    assert(ids2.toSeq == ids.toSeq)
  }

  test("runV2 (mjlog DSv2 source) writes tables identical to the typed path") {
    val out2 = Files.createTempDirectory("graft_etl_v2_").toString
    Pipeline.runV2(spark, getClass.getResource("/mjlog").getPath, out2)
    for (t <- Pipeline.TableNames) {
      val a = spark.read.parquet(s"$outDir/$t")
      val b = spark.read.parquet(s"$out2/$t")
      assert(a.schema == b.schema, s"$t schema differs")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t rows differ between typed and DSv2-sourced pipelines")
    }
  }

  test("referential integrity: children reference existing parents") {
    val kyokuIds = table("kyokus").select(col("id").as("kyoku_id"))
    for (child <- Seq("haipais", "actions", "agaris", "nagares")) {
      val orphans = table(child).join(kyokuIds, Seq("kyoku_id"), "left_anti")
      assert(orphans.count() == 0, s"orphan rows in $child")
    }
    val gameIds = table("games").select(col("id").as("game_id"))
    for (child <- Seq("rules", "game_players", "game_scores", "kyokus")) {
      val orphans = table(child).join(gameIds, Seq("game_id"), "left_anti")
      assert(orphans.count() == 0, s"orphan rows in $child")
    }
  }

  test("every kyoku ends in agari xor nagare") {
    val a = table("agaris").select(col("kyoku_id")).distinct()
    val n = table("nagares").select(col("kyoku_id")).distinct()
    assert(a.intersect(n).count() == 0)
    assert(a.count() + n.count() == table("kyokus").count())
  }

  test("agari nested yaku structure survives the round trip") {
    val row = table("agaris").where(col("owari") && col("who") === 0)
      .select(explode(col("yaku")).as("y")).select("y.name", "y.han")
      .orderBy("name").collect()
    assert(row.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("ドラ", 2), ("平和", 1), ("門前清自摸和", 1)))
  }

  test("corrupt xml files are skipped, not fatal") {
    val log = Files.createTempDirectory("graft_corrupt_")
    val day = log.resolve("20240105")
    Files.createDirectories(day)
    val good = Paths.get(getClass
      .getResource("/mjlog/20240101/2024010100gm-0001.xml").toURI)
    Files.copy(good, day.resolve("ok.xml"))
    Files.writeString(day.resolve("bad.xml"), "<mjloggm ver='2.3'><GO")
    val parsed = Pipeline.parseLogs(spark, log.toString)
    assert(parsed.count() == 1)
    assert(parsed.collect().head.game_id == "ok")
  }

  test("game_scores decimal points") {
    val pts = table("game_scores")
      .where(col("game_id") === "2024010100gm-0001")
      .orderBy("player_index").select("point").collect()
      .map(_.getDecimal(0).toPlainString)
    assert(pts.toSeq == Seq("32.7", "-16.3", "5.0", "-21.4"))
  }
}

package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipeline

/** Incremental ETL: files arriving across micro-batches append to the
  * same tables with continuous, collision-free kyoku ids.
  */
class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def copyFixture(rel: String, logDir: Path): Unit = {
    val src = Paths.get(getClass.getResource(s"/mjlog/$rel").toURI)
    val dst = logDir.resolve(rel)
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
  }

  test("two AvailableNow runs: second batch appends with continued ids") {
    val logDir = Files.createTempDirectory("graft_slog_")
    val outDir = Files.createTempDirectory("graft_sout_").toString
    val ckpt = Files.createTempDirectory("graft_sck_").toString

    copyFixture("20240101/2024010100gm-0001.xml", logDir)
    StreamingPipeline.runAvailable(spark, logDir.toString, outDir, ckpt)
    val afterFirst = spark.read.parquet(s"$outDir/kyokus").count()
    assert(afterFirst == 1)

    // a new game for the same date arrives later
    copyFixture("20240101/2024010101gm-0002.xml", logDir)
    StreamingPipeline.runAvailable(spark, logDir.toString, outDir, ckpt)

    val kyokus = spark.read.parquet(s"$outDir/kyokus")
    assert(kyokus.count() == 3) // 1 + 2, first file not reprocessed
    val ids = kyokus.orderBy("id").select("id").collect().map(_.getLong(0))
    assert(ids.distinct.length == 3, s"id collision: ${ids.toSeq}")
    val base = java.time.LocalDate.of(2024, 1, 1).toEpochDay * 100000L
    assert(ids.toSet == Set(base, base + 1, base + 2))

    // children reference valid parents after both batches
    val orphan = spark.read.parquet(s"$outDir/actions")
      .join(kyokus.select(col("id").as("kyoku_id")), Seq("kyoku_id"), "left_anti")
    assert(orphan.count() == 0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.Pipeline
import graft.model.ParsedGame

/** Dev probe: phase-by-phase wall of the ETL for the typed vs V2 source.
  * Mirrors Pipeline.runImpl. Run:
  * sbt "Test/runMain graft.V2Probe3 <logDir> typed|v2".
  */
object V2Probe3 {
  def main(args: Array[String]): Unit = {
    val logDir = args(0)
    val mode = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.files.minPartitionNum", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v2probe3] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val src =
      if (mode == "v2") spark.read.format("mjlog").load(logDir).as[ParsedGame]
      else Pipeline.parseLogs(spark, logDir)
    val race = args.contains("race")
    if (args.contains("dyn"))
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if (args.contains("utc"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (args.contains("warm")) {
      val warm = java.nio.file.Files.createTempDirectory("graft_warm_")
      spark.range(64).selectExpr("id", "id % 4 AS dt")
        .write.mode("overwrite").partitionBy("dt").parquet(warm.toString)
      spark.read.parquet(warm.toString).count()
    }
    val parsed = src.repartition(col("dt")).cache()
    if (!race) timed("repartition+cache build") { parsed.count() }
    val kb = Pipeline.kyokusBase(parsed).cache()
    if (!race) timed("kyokusBase cache build") { kb.count() }
    val dts = Pipeline.tables(parsed, kb)
    val out = java.nio.file.Files.createTempDirectory("v2probe3").toString
    timed("9 concurrent writes") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val jobs = Pipeline.TableNames.map { name =>
        Future {
          dts(name)
            .withColumn("dt", date_format(col("dt"), "yyyy-MM-dd"))
            .write.mode("overwrite").partitionBy("dt")
            .parquet(s"$out/$name")
        }
      }
      jobs.foreach(Await.result(_, Duration.Inf))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}

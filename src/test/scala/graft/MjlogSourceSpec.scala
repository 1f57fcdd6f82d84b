package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipeline

/** DataSource V2 `mjlog` format (graft.sources.MjlogDataSource): the
  * reference's directory-scan + XML-parse path (E6/E7) exposed as
  * `spark.read.format("mjlog")`. The spec pins it row-for-row to the
  * typed ETL path over the same fixtures, and checks the short-name
  * registration and column pruning.
  */
class MjlogSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val logDir = getClass.getResource("/mjlog").getPath

  test("format(\"mjlog\") resolves by short name and matches the typed parser") {
    val viaSource = spark.read.format("mjlog").load(logDir)
    val viaEtl = Pipeline.parseLogs(spark, logDir).toDF()
    assert(viaSource.schema == viaEtl.schema)
    val a = viaSource.orderBy("game_id").toJSON.collect().toSeq
    val b = viaEtl.orderBy("game_id").toJSON.collect().toSeq
    assert(a == b)
    assert(a.size == 4) // one row per fixture game
  }

  test("column pruning reaches the reader: a narrow select reads a narrow schema") {
    val df = spark.read.format("mjlog").load(logDir)
      .select("game_id", "sanma")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val out = scan.output.map(_.name)
    assert(out == Seq("game_id", "sanma"),
      s"pushed-down schema must be exactly the selected columns, got $out")
    val rows = df.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).distinct.length == 4)
  }

  test("dt filter prunes InputPartitions at file-listing time (E4)") {
    val df = spark.read.format("mjlog").load(logDir)
    // under default conf each KB-sized fixture carries the 4 MB
    // open-cost, filling one maxSplitBytes bin → one file per partition
    // here (bin-packing only kicks in for larger corpora / lower
    // openCostInBytes — MjlogSourceSpec below asserts that case)
    assert(df.rdd.getNumPartitions == 4)
    val eq = df.where(col("dt") === lit(java.sql.Date.valueOf("2024-01-01")))
    assert(eq.rdd.getNumPartitions == 2,
      "equality on path-derived dt must list only that day's files")
    assert(eq.count() == 2)
    val gt = df.where(col("dt") > lit(java.sql.Date.valueOf("2024-01-01")))
    assert(gt.rdd.getNumPartitions == 2 && gt.count() == 2)
    // the filter shows up as pushed in the scan (explain visibility):
    // MjlogScan.description() prints the pushed dt filters and BatchScan
    // includes it in the plan string, so this fails if pushFilters stops
    // retaining the dt predicate
    val plan = eq.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(dt,"),
      s"pushed dt filter must be visible in the executed plan, got:\n$plan")
    // row parity with the typed path under the same predicate
    val typed = Pipeline.parseLogs(spark, logDir).toDF()
      .where(col("dt") === lit(java.sql.Date.valueOf("2024-01-01")))
    assert(eq.orderBy("game_id").toJSON.collect().toSeq ==
           typed.orderBy("game_id").toJSON.collect().toSeq)
  }

  test("small files bin-pack into one partition when open-cost allows") {
    val prevCost = spark.conf.getOption("spark.sql.files.openCostInBytes")
    val prevMin = spark.conf.getOption("spark.sql.files.minPartitionNum")
    def restore(k: String, v: Option[String]): Unit =
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    try {
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      spark.conf.set("spark.sql.files.minPartitionNum", "1")
      val df = spark.read.format("mjlog").load(logDir)
      assert(df.rdd.getNumPartitions == 1,
        "with zero open-cost the 4 KB-sized files must pack into one task")
      assert(df.count() == 4)
    } finally {
      restore("spark.sql.files.openCostInBytes", prevCost)
      restore("spark.sql.files.minPartitionNum", prevMin)
    }
  }

  test("one corrupt xml is skipped, not fatal (parity with Pipeline.parseRaw)") {
    val dir = java.nio.file.Files.createTempDirectory("mjlog-corrupt")
    val day = dir.resolve("20240101")
    java.nio.file.Files.createDirectories(day)
    val good = java.nio.file.Paths.get(logDir, "20240101", "2024010100gm-0001.xml")
    java.nio.file.Files.copy(good, day.resolve("2024010100gm-0001.xml"))
    java.nio.file.Files.write(day.resolve("2024010199gm-bad.xml"),
      "<mjloggm ver=\"2.3\"><UNCLOSED".getBytes("UTF-8"))
    val skipped = graft.etl.ParseMetrics.skippedFiles(spark)
    val before = skipped.value
    val rows = spark.read.format("mjlog").load(dir.toString)
      .select("game_id").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("2024010100gm-0001"),
      "the corrupt file must contribute zero rows; the good one must survive")
    assert(skipped.value - before == 1,
      "the skip must be counted in the graft.mjlog.skippedFiles accumulator")
  }

  test("nested children survive the source boundary (kyokus → actions)") {
    val n = spark.read.format("mjlog").load(logDir)
      .select(explode(col("kyokus")).as("k"))
      .select(size(col("k.actions")).as("na"))
      .agg(sum(col("na"))).first.getLong(0)
    val m = Pipeline.parseLogs(spark, logDir).toDF()
      .select(explode(col("kyokus")).as("k"))
      .select(size(col("k.actions")).as("na"))
      .agg(sum(col("na"))).first.getLong(0)
    assert(n == m && n > 0)
  }
}

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

package graft

import org.apache.spark.sql.SparkSession

import graft.etl.Pipeline
import graft.functions.GraftFunctions

/** The Athena-replacement UX: register the 9 parsed tables (plus
  * paiyamas if generated) as temp views and the codec UDFs, so a
  * reference user points spark.sql at the same table names their Athena
  * queries use (README.md:2 — "analyze with Athena").
  *
  * {{{
  *   MahjongCatalog.registerViews(spark, "/lake/tenhou")
  *   spark.sql("SELECT count(*) FROM kyokus WHERE dt = '2024-01-01'")
  * }}}
  */
object MahjongCatalog {
  def registerViews(spark: SparkSession, tablesDir: String): Unit = {
    (Pipeline.TableNames :+ "paiyamas").foreach { name =>
      val path = new java.io.File(s"$tablesDir/$name")
      if (path.exists())
        spark.read.parquet(path.toString).createOrReplaceTempView(name)
    }
    GraftFunctions.register(spark)
    graft.expressions.GraftExtensions.install(spark)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Throwaway capability probe (dev-only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    Tables.events(spark, d).createOrReplaceTempView("events")
    try {
      val t0 = System.nanoTime()
      val df = spark.sql(
        """WITH RECURSIVE cal AS (
          |  SELECT DATE '2024-01-01' AS day
          |  UNION ALL
          |  SELECT date_add(day, 1) FROM cal WHERE day < DATE '2024-01-31'
          |)
          |SELECT c.day, count(e.event_id) AS n_events
          |FROM cal c LEFT JOIN events e ON to_date(e.ts) = c.day
          |GROUP BY c.day ORDER BY c.day""".stripMargin)
      val rows = df.collect()
      println(f"PROBE calendar rows=${rows.length} last=${rows.last} t=${(System.nanoTime()-t0)/1e9}%.2f s")
      println("PROBE limit conf: " + spark.conf.getOption("spark.sql.cteRecursionLevelLimit"))
    } catch { case e: Throwable => println("PROBE FAILED: " + e.toString.take(400)) }
    spark.stop()
  }
}

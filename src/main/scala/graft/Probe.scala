package graft

import org.apache.spark.sql.SparkSession

/** Throwaway capability/timing probe (dev-only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/region.parquet").count()
    for (name <- Seq("q_dedup_near_clusters", "q_dedup_canonical")) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name median=${times.sorted.apply(1)}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

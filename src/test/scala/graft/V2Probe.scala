package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: isolate where the mjlog DSv2 path spends time vs the typed
  * binaryFile+flatMap path. Run: sbt "Test/runMain graft.V2Probe <logDir>".
  */
object V2Probe {
  def main(args: Array[String]): Unit = {
    val logDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.files.minPartitionNum", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v2probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    timed("warm typed rows") {
      graft.etl.Pipeline.parseLogs(spark, logDir).queryExecution.toRdd.count()
    }
    timed("typed rows (scan+parse+serialize)") {
      graft.etl.Pipeline.parseLogs(spark, logDir).queryExecution.toRdd.count()
    }
    val v2 = spark.read.format("mjlog").load(logDir)
    println("[v2probe] v2 partitions: " + v2.rdd.getNumPartitions)
    timed("v2 rows (scan+parse+serialize)") {
      spark.read.format("mjlog").load(logDir).queryExecution.toRdd.count()
    }
    timed("v2 rows again") {
      spark.read.format("mjlog").load(logDir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}

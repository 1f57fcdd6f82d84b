package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the SCALE.md growth protocol on the ETL gate pipeline
  * itself: generate the widened LogGen corpus at 1× (3 dates × 30
  * games, the gate seed) and 10× (6 dates × 150), run the batch
  * Pipeline AND the checkpointed streaming drain over each, time the
  * four walls, and assert content-digest parity (all 9 tables) holds
  * at both scales. Usage: Test/runMain graft.MjGateScaleProbe [mult]
  */
object MjGateScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def runScale(tag: String, nDates: Int, perDate: Int): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_mjgate_scale_$tag").toString
      timed(s"$tag loggen ($nDates x $perDate)") {
        graft.etl.LogGen.main(Array(s"$root/logs",
          nDates.toString, perDate.toString, "20260817"))
      }
      timed(s"$tag batch etl") {
        graft.etl.Pipeline.run(spark, s"$root/logs", s"$root/batch")
      }
      timed(s"$tag stream etl") {
        graft.streaming.StreamingPipeline.runAvailable(spark,
          s"$root/logs", s"$root/stream", s"$root/ckpt")
      }
      val parity = timed(s"$tag parity check") {
        graft.queries.MahjongAnalytics
          .parityFrame(spark, s"$root/batch", s"$root/stream").collect()
      }
      val bad = parity.filterNot(_.getAs[Boolean]("parity"))
      println(s"PROBE $tag parity rows=${parity.length} bad=${bad.length}")
      bad.foreach(r => println(s"PROBE $tag BAD: $r"))
    }

    // first run pays JIT/codegen warmup — the warm x1 re-run is the
    // denominator for the x10 growth ratio
    runScale("x1_cold", 3, 30)
    runScale("x1_warm", 3, 30)
    runScale("x10", 6, 150)
    spark.stop()
  }
}

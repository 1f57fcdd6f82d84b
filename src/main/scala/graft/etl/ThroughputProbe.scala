package graft.etl

import org.apache.spark.sql.SparkSession

/** Stage-by-stage timing of the ETL on a log dir (dev tool). */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val logDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import spark.implicits._
    timed("list+read bytes only") {
      spark.read.format("binaryFile").option("pathGlobFilter", "*.xml")
        .option("recursiveFileLookup", "true").load(logDir)
        .select("content").as[Array[Byte]].map(_.length).reduce(_ + _)
    }
    val parsed = Pipeline.parseLogs(spark, logDir)
    timed("parse (count only)") { parsed.count() }
    timed("parse+encode cache") { parsed.cache().count() }
    val kb = Pipeline.kyokusBase(parsed)
    timed("kyokusBase window") { kb.cache().count() }
    val dts = Pipeline.tables(parsed, kb)
    Pipeline.TableNames.foreach { t =>
      timed(s"project $t") { dts(t).count() }
    }
    spark.stop()
  }
}

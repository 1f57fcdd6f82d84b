package graft

/** Scratch probe: what schema does the state data source expose for a
  * streaming aggregation checkpoint? Run:
  * `sbt "Test/runMain graft.StateProbe"`.
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stateprobe_")
    val q = ms.toDF().toDF("user_id", "value")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           sum((col("value") * 100).cast("long")).as("c"))
      .writeStream.format("memory").queryName("state_probe")
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Update).start()
    ms.addData(Seq((1L, 2.0), (1L, 3.0), (2L, 10.0)))
    q.processAllAvailable()
    ms.addData(Seq((1L, 5.0), (3L, 1.0)))
    q.processAllAvailable()
    q.stop()
    val st = spark.read.format("statestore").option("path", ckpt.toString).load()
    st.printSchema()
    st.show(20, false)
    spark.stop()
  }
}

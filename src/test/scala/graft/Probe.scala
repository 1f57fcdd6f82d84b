package graft

import org.apache.spark.sql.SparkSession

/** Throwaway capability/timing probe (dev-only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    spark.read.parquet(s"$d/customer.parquet").createOrReplaceTempView("customer")
    spark.read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders")
    try {
      val df = spark.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |ORDER BY c.c_custkey, o.o_totalprice DESC""".stripMargin)
      println("PROBE lateral rows=" + df.count())
    } catch { case e: Throwable => println("PROBE lateral FAILED: " + e.toString.take(300)) }
    spark.stop()
  }
}

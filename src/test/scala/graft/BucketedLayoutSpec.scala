package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB co-location story (SCALE.md "Joins"): fact tables bucketed
  * on the join key join with NO exchange on either side — the shuffle
  * happens once at write time and is amortized over every subsequent
  * join.
  */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_bucketed")
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("g_orders_bucketed")
      Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("g_lineitem_bucketed")

      val joined = spark.table("g_orders_bucketed")
        .join(spark.table("g_lineitem_bucketed"),
              col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // and the co-located join returns the same rows as the shuffled one
      assert(joined.count() ==
        Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}

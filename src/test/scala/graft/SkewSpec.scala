package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Skew

/** Salting preserves join/aggregation results while spreading hot keys. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join on the skewed user_id key") {
    val events = Tables.events(spark, sf)  // 15 hot user_id values
    val users = Tables.events(spark, sf)
      .groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("user_events"))
    val plain = events.join(users, col("user_id") === col("uid"))
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("user_events").as("s"))
    val salted = Skew.saltedJoin(events, users, "user_id", "uid", salts = 8)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("user_events").as("s"))
    assert(salted.orderBy("user_id").collect().toSeq ==
           plain.orderBy("user_id").collect().toSeq)
  }

  test("salted two-phase aggregation equals direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_l_quantity"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", salts = 8)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(salted.toSeq == direct.toSeq)
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** The oracle runs q_dq_checks on clean TPC-H data where every check
  * passes — which would also be the output of a broken check that never
  * fires. This spec plants one violation of each kind and asserts the
  * exact counts, proving the detectors detect.
  */
class DqChecksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dirtyDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dq_").toString
    val ts = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    // orders: duplicate PK (1), orphan custkey (99), null price (id 3),
    // bad status (id 4)
    Seq(
      (1L, 10L, "F", Option(100.0), ts, "1-URGENT"),
      (1L, 10L, "F", Option(101.0), ts, "1-URGENT"), // dup PK
      (2L, 99L, "O", Option(102.0), ts, "2-HIGH"),   // orphan FK
      (3L, 10L, "O", None: Option[Double], ts, "2-HIGH"), // null price
      (4L, 11L, "X", Option(103.0), ts, "3-MEDIUM")) // bad status
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // lineitem: one orphan orderkey (999), one out-of-range quantity
    Seq((1L, 5.0), (999L, 10.0), (2L, 77.0))
      .toDF("l_orderkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((10L, "a"), (11L, "b"))
      .toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    dir
  }

  test("every declared constraint fires on its planted violation") {
    val rows = Relational.qDqChecks(spark, dirtyDir).collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass")))).toMap
    assert(rows == Map(
      "pk_unique_o_orderkey"  -> ((1L, false)),
      "fk_lineitem_orders"    -> ((1L, false)),
      "fk_orders_customer"    -> ((1L, false)),
      "not_null_o_totalprice" -> ((1L, false)),
      "range_l_quantity_1_50" -> ((1L, false)),
      "set_o_orderstatus"     -> ((1L, false))))
  }
}

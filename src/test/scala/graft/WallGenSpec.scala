package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.WallGen

/** Wall generator (E14): determinism, id scheme, permutation invariant. */
class WallGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("every wall is a permutation of 0..135") {
    val df = WallGen.generate(spark, 64, LocalDate.of(2024, 1, 1))
    val bad = df.where(
      size(array_distinct(col("pai_ids"))) =!= 136 ||
      array_min(col("pai_ids")) =!= 0 || array_max(col("pai_ids")) =!= 135)
    assert(bad.count() == 0)
    assert(df.count() == 64)
  }

  test("ids follow 9e11 + days*100000 + seq") {
    val days = LocalDate.of(2024, 1, 1).toEpochDay
    val ids = WallGen.generate(spark, 5, LocalDate.of(2024, 1, 1))
      .orderBy("id").select("id").collect().map(_.getLong(0))
    assert(ids.head == WallGen.IdOffset + days * 100000L)
    assert(ids.toSeq == (0 until 5).map(i => ids.head + i))
  }

  test("deterministic under seed, different under another seed") {
    def walls(seed: Long) =
      WallGen.generate(spark, 8, LocalDate.of(2024, 1, 1), seed)
        .orderBy("id").collect().map(_.getSeq[Int](1)).toSeq
    assert(walls(42) == walls(42))
    assert(walls(42) != walls(43))
    // and the walls are actually shuffled, not identity
    assert(walls(42).head != (0 until 136))
  }
}

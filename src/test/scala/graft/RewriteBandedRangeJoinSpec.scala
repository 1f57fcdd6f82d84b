package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The banded-range-join optimizer rule: fires on small constant bands
  * (either side anchoring), preserves exact semantics incl. nulls, and
  * stays away from wide bands and outer joins.
  */
class RewriteBandedRangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def left = {
    import spark.implicits._
    Seq((1L, 10), (2L, 20), (3L, 30), (4L, 0)).toDF("lk", "lx")
  }
  private def right = {
    import spark.implicits._
    Seq((101L, 9), (102L, 11), (103L, 22), (104L, 35)).toDF("rk", "ry")
  }

  test("declarative between rewrites to Generate + equi-join, same rows") {
    val j = left.join(right, col("ry").between(col("lx") - 2, col("lx") + 2))
      .select("lk", "rk").orderBy("lk", "rk")
    assert(planOf(j).contains("Generate"), "rule should band-explode")
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // |ry - lx| <= 2: (1,101) 10~9, (1,102) 10~11, (2,103) 20~22
    assert(got == Set((1L, 101L), (1L, 102L), (2L, 103L)))
  }

  test("band anchored on the right side rewrites symmetrically") {
    val j = left.join(right, col("lx").between(col("ry") - 2, col("ry") + 2))
      .select("lk", "rk")
    assert(planOf(j).contains("Generate"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (1L, 102L), (2L, 103L)))
  }

  test("null band anchors match nothing, exactly like the raw between") {
    import spark.implicits._
    val l = Seq((1L, Some(10)), (2L, None)).toDF("lk", "lx")
    val j = l.join(right, col("ry").between(col("lx") - 2, col("lx") + 2))
      .select("lk", "rk")
    assert(planOf(j).contains("Generate"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (1L, 102L)))
  }

  test("wide bands and outer joins are left alone") {
    val wide = left.join(right,
      col("ry").between(col("lx") - 50, col("lx") + 50))
    assert(!planOf(wide).contains("Generate"),
           "a 101-value band must not explode")
    val outer = left.join(right,
      col("ry").between(col("lx") - 2, col("lx") + 2), "left")
    assert(!planOf(outer).contains("Generate"),
           "outer joins need null-extension bookkeeping the rule avoids")
    // both still compute correctly through the untouched plan
    assert(wide.count() >= outer.count() - left.count())
  }

  test("the gate query itself plans banded: theta range carries a Generate") {
    val p = planOf(graft.queries.Relational
      .qJoinThetaRange(spark, "/root/testdata/sf0.001"))
    assert(p.contains("Generate"),
           "declarative between in q_join_theta_range should now band-explode")
    assert(!p.contains(">= (p_size"), "range pair must be absorbed into keys")
  }
}

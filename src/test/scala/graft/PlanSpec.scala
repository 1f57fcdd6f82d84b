package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the hand-verified physical-plan
  * invariants (pushdown, pruning, broadcast choice, top-k operator,
  * no-cartesian) asserted via explain("formatted") text, so an
  * optimizer-visible regression turns a test red instead of silently
  * shipping a 100×-worse plan.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    plan(SparkEntry.queries(name)(spark, sf))
  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q_headline_shipping: pushed segment filter, broadcast dims, top-k operator") {
    val p = plan("q_headline_shipping")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
           "segment filter must reach the customer scan")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
           "customer and orders must broadcast into the lineitem probe")
    assert(p.contains("TakeOrderedAndProject"),
           "global top-k must be TakeOrderedAndProject, not sort-then-limit")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_scan_pruned: shipdate range pushed to the scan, columns pruned") {
    val p = plan("q_scan_pruned")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
           p.contains("LessThan(l_shipdate"),
           "the date range must appear in PushedFilters")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_shipdate") &&
           !read.contains("l_extendedprice") && !read.contains("l_comment"),
           s"scan must read only the projected columns, got: $read")
  }

  test("q_sim_knn_join: equi-join pair generation, no forced broadcast") {
    val p = plan("q_sim_knn_join")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
           "probe×candidate pairing must be an equi-join on the block id")
    assert(p.contains("partial_topkbyscore"),
           "per-probe top-k must partial-aggregate map-side")
    // the local broadcast of the replicated probe side is Catalyst's
    // size-based call, not a hint: with the threshold off the same query
    // plans a shuffle join and returns identical rows
    val thresholds = Seq("spark.sql.autoBroadcastJoinThreshold",
                         "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = thresholds.map(k => k -> spark.conf.getOption(k))
    val before = SparkEntry.queries("q_sim_knn_join")(spark, sf).collect()
    try {
      thresholds.foreach(spark.conf.set(_, "-1"))
      val df = SparkEntry.queries("q_sim_knn_join")(spark, sf)
      val p2 = plan(df)
      assert(!p2.contains("BroadcastExchange"),
             "with the size threshold off, no side may broadcast — " +
             "a surviving BroadcastExchange means a hint crept back in")
      assert(!p2.contains("CartesianProduct"))
      assert(df.collect().toSeq == before.toSeq,
             "shuffle-join plan must return identical rows")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no CartesianProduct anywhere; nested-loop joins only for constant-size sides") {
    // documented tiny-side broadcast crossJoins (constant-size builds:
    // a single query vector, the 16-row centroid table, a 1-row count)
    // compile to BroadcastNestedLoopJoin — allowed there and only there
    val bnljAllowed = Set("q_sim_topk", "q_sim_ann_ivf", "q_sim_knn_join_ivf",
                          "q_text_tfidf")
    // streaming entries run a MemoryStream to completion when invoked —
    // the returned DataFrame is a local result-table scan with no joins,
    // so re-running them here buys no plan coverage at real cost
    val skip = SparkEntry.queries.keySet.filter(_.startsWith("q_stream_"))
    val bad = (SparkEntry.queries.keySet -- skip).toSeq.sorted.flatMap { n =>
      val p = plan(n)
      val cart = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(n)
      if (cart || bnlj)
        Some(s"$n: ${if (cart) "CartesianProduct " else ""}${if (bnlj) "BNLJ" else ""}")
      else None
    }
    assert(bad.isEmpty, s"non-equi join shapes leaked into: $bad")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf
import graft.queries.Relational

/** Native as-of join operator vs the window-rank formulation. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("native as-of equals the join+row_number formulation") {
    val native = Relational.qJoinAsofNative(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val windowed = Relational.qJoinAsof(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(native.length == windowed.length)
    assert(native.toSeq == windowed.toSeq)
  }

  test("the physical plan uses AsOfJoinExec with one exchange per side") {
    val e = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate")
    val df = AsOf.join(e, o, e("user_id"), o("o_custkey"),
                       e("ts"), o("o_orderdate"),
                       rightTieBreak = Seq(o("o_orderkey")))
    val plan = df.queryExecution.executedPlan.toString
    // physical nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.split("Exchange hashpartitioning").length == 3, plan) // 2 exchanges
    // no WindowExec, no fanout join
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("randomized differential vs the window formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // heavy duplication: few keys, coarse times, some null keys
    val lRows = (0 until 400).map { i =>
      (i.toLong,
       if (rng.nextInt(10) == 0) None else Some(rng.nextInt(8).toLong),
       rng.nextInt(40).toLong)
    }
    val rRows = (0 until 300).map { i =>
      (1000L + i, rng.nextInt(8).toLong, rng.nextInt(40).toLong)
    }
    val l = lRows.toDF("lid", "k", "t")
    val r = rRows.toDF("rid", "k2", "t2")
    val native = AsOf.join(l, r, l("k"), r("k2"), l("t"), r("t2"),
                           rightTieBreak = Seq(r("rid")))
      .select(col("lid"), col("rid")).orderBy("lid").collect()
      .map(row => (row.getLong(0),
                   if (row.isNullAt(1)) -1L else row.getLong(1)))
    // reference semantics: brute-force per left row
    val expected = lRows.map { case (lid, kOpt, t) =>
      val best = kOpt.toSeq.flatMap { k =>
        rRows.filter(rr => rr._2 == k && rr._3 <= t)
      }.sortBy(rr => (rr._3, rr._1)).lastOption
      (lid, best.map(_._1).getOrElse(-1L))
    }
    assert(native.toSeq == expected)
  }

  test("handcrafted edges: no match, tie on time, exact-equal time") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L),
                (4L, 30L, 500L))
      .toDF("lid", "k", "t")
    val r = Seq((101L, 10L, 90L), (102L, 10L, 100L), (103L, 10L, 150L),
                (104L, 20L, 60L), (105L, 10L, 100L))
      .toDF("rid", "k2", "t2")
    val out = AsOf.join(l, r, l("k"), r("k2"), l("t"), r("t2"),
                        rightTieBreak = Seq(r("rid")))
      .select(col("lid"), col("rid"))
      .orderBy("lid")
      .collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
    assert(out.toSeq == Seq(
      (1L, 105L), // t=100: rows 102 and 105 tie at t2=100 -> max rid wins
      (2L, 103L), // t=200: latest is t2=150
      (3L, -1L),  // key 20 exists but t2=60 > 50 -> no match
      (4L, -1L))) // key 30 absent
  }

  test("as-of with tolerance nulls exactly the matches older than the TTL") {
    val plain = Relational.qJoinAsof(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val tol = Relational.qJoinAsofTolerance(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(plain.keySet == tol.keySet)
    // driver-side truth in epoch micros (UTC session; avoids java.time
    // vs java.sql row accessor differences)
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
              unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect()
    val dayUs = 86400000000L
    var nulledByTtl = 0
    var freshKept = 0
    events.foreach { r =>
      val (eid, uid, ets) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = orders.getOrElse(uid, Array.empty)
        .filter { case (_, _, od) => od <= ets }
      val best = cands.sortBy { case (_, ok, od) => (od, ok) }.lastOption
      assert(plain(eid) == best.map(_._2), s"event $eid plain asof")
      val fresh = best.filter { case (_, _, od) => od >= ets - 9131 * dayUs }
      assert(tol(eid) == fresh.map(_._2), s"event $eid tolerance asof")
      if (best.isDefined && fresh.isEmpty) nulledByTtl += 1
      if (fresh.isDefined) freshKept += 1
    }
    // non-degeneracy: the TTL must land inside the gap distribution —
    // some matches survive AND some are nulled
    assert(nulledByTtl > 0, "the TTL must actually null some stale matches")
    assert(freshKept > 0, "the TTL must actually keep some fresh matches")
  }
}

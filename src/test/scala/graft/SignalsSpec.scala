package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Round-16 signals wave: PSI drift, regression-error eval, argmax
  * carriers, embedding whitening, spatial NN join, inter-arrival
  * percentiles. The DuckDB oracle hash-compares all six per driver
  * run; these specs assert the semantic identities the hash can't
  * express — metric bounds, brute-force re-derivations, whitening
  * invariants — plus the plan shape of the NN join.
  */
class SignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_dq_psi: psi is non-negative and tiny on identically " +
       "distributed halves; totals cover the corpus") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_dq_psi")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur"))
      .sum == total)
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0 up to the 8-dp
      // term rounding; both windows draw the same generator, so no
      // type may trip the 0.2 alert line. (Sampling noise scales as
      // ~bins/2n: ≈0.12 at this 1k-row fixture, 0.03 at the sf0.01
      // gate, 0.003 at sf1 — the flag contract is what's pinned here.)
      assert(psi >= -1e-6, s"${r.getString(0)}: psi $psi negative")
      assert(!r.getAs[Boolean]("drifted"),
        s"${r.getString(0)}: psi $psi tripped the alert on iid halves")
    }
  }

  test("q_eval_regression: metrics match a driver-side recompute of " +
       "the lag-7 forecast on one event type") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_eval_regression")(spark, sf).collect()
    assert(rows.nonEmpty)
    val tpe = rows.head.getString(0)
    val daily = Tables.events(spark, sf)
      .where(col("event_type") === tpe)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("a"))
      .orderBy("day").collect().map(_.getAs[Long]("a"))
    val pairs = daily.drop(7).zip(daily.dropRight(7))
    val n = pairs.length.toDouble
    val mae = pairs.map { case (a, f) => math.abs(a - f) }.sum / n
    val rmse = math.sqrt(
      pairs.map { case (a, f) => (a - f).toDouble * (a - f) }.sum / n)
    val r = rows.head
    assert(r.getAs[Long]("n_days") == pairs.length)
    assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-6)
    assert(math.abs(r.getAs[Double]("rmse") - rmse) < 1e-6)
    assert(r.getAs[Double]("r2") <= 1.0 + 1e-9)
    assert(r.getAs[Double]("mape") >= 0.0)
  }

  test("q_agg_argmax: the carriers are the true per-type extrema of " +
       "the user-total table") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_agg_argmax")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sf)
      .groupBy("event_type", "user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val g = totals(r.getString(0))
        .map(x => (x.getAs[java.math.BigDecimal]("total").doubleValue,
          x.getAs[Long]("user_id")))
      assert((r.getAs[Double]("top_total"), r.getAs[Long]("top_user")) ==
        g.max, s"${r.getString(0)} top mismatch")
      assert((r.getAs[Double]("bottom_total"), r.getAs[Long]("bottom_user")) ==
        g.min, s"${r.getString(0)} bottom mismatch")
      assert(r.getAs[Long]("n_users") == g.length)
    }
  }

  test("q_embed_whiten: whitened sums stay centered and the corpus " +
       "max |z| is a genuine standardized outlier bound") {
    val rows = SparkEntry.queries("q_embed_whiten")(spark, sf).collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.length == nVec)
    // Σ over ALL vectors of a dim's z is 0 by construction; summing the
    // per-vector sums reproduces that total across all dims
    val grand = rows.map(_.getAs[Double]("sum_z")).sum
    assert(math.abs(grand) < 0.01 * nVec,
      s"whitened grand total $grand not centered")
    rows.foreach { r =>
      val mx = r.getAs[Double]("max_abs_z")
      assert(mx > 0.0 && mx < 10.0, s"max|z| $mx implausible")
    }
  }

  test("q_join_spatial_nn: equals the brute-force nearest neighbor " +
       "and plans as an equi-join (no cartesian)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_join_spatial_nn")(spark, sf).collect()
      .map(r => r.getAs[Long]("a_id") ->
        (r.getAs[Long]("nn_id"), r.getAs[Long]("nn_d2"))).toMap
    def pts(tpe: String) = Tables.events(spark, sf)
      .where(col("event_type") === tpe)
      .select(col("event_id"),
        conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
          .cast("long").as("x"),
        conv(substring(md5(col("event_id").cast("string")), 5, 4), 16, 10)
          .cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clicks = pts("click")
    val views = pts("view")
    val r2 = 32000000000L / views.length // the density-adaptive budget
    val brute = clicks.flatMap { case (id, x, y) =>
      val cand = views.map { case (vid, vx, vy) =>
        ((x - vx) * (x - vx) + (y - vy) * (y - vy), vid)
      }.filter(_._1 <= r2)
      if (cand.isEmpty) None else Some(id -> {
        val m = cand.min; (m._2, m._1)
      })
    }.toMap
    assert(rows == brute, s"grid NN diverges from brute force " +
      s"(grid ${rows.size}, brute ${brute.size})")
    val p = SparkEntry.queries("q_join_spatial_nn")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_time_interarrival: percentiles bracket correctly and the " +
       "mean matches an exact integer recompute") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_time_interarrival")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p50 = r.getAs[Long]("p50_us")
      val p90 = r.getAs[Long]("p90_us")
      val mx = r.getAs[Long]("max_us")
      assert(p50 <= p90 && p90 <= mx,
        s"${r.getString(0)}: percentile ordering violated")
      assert(r.getAs[Long]("n_gaps") > 0)
    }
    // exact mean recompute for one type
    val tpe = rows.head.getString(0)
    val ts = Tables.events(spark, sf)
      .where(col("event_type") === tpe)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().groupBy(_.getLong(0))
    val gaps = ts.values.flatMap { evs =>
      val s = evs.map(r => (r.getLong(1), r.getLong(2))).sorted
      s.zip(s.drop(1)).map { case ((a, _), (b, _)) => b - a }
    }.toSeq
    val want = BigDecimal(gaps.sum) / gaps.length
    val got = rows.head.getAs[Double]("mean_us")
    assert(math.abs(got - want.toDouble) < 0.01,
      s"mean_us $got vs recompute $want")
  }
}

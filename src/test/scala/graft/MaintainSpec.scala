package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Maintain

/** Lake-operations wave: incremental aggregate-state maintenance,
  * file lineage, CUSUM changepoint, Zipf fit. The DuckDB oracle
  * hash-compares all four per driver run; these specs assert the
  * semantic identities behind the hashes (merge losslessness, lineage
  * conservation, the CUSUM argmax against an independent in-memory
  * recompute, OLS agreement) plus the plan shapes that matter at scale.
  */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q_agg_incremental_state: state+delta merge equals the full recompute") {
    val merged = Maintain.qAggIncrementalState(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
         r.getAs[Double]("total_value")))).toMap
    val full = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
         r.getAs[Double]("total_value")))).toMap
    assert(merged == full,
      "the persisted-partials merge must lose nothing vs a full rescan")
  }

  test("q_scan_lineage: per-file meters conserve the table totals") {
    val rows = Maintain.qScanLineage(spark, sf).collect()
    assert(rows.length == 8, "orders seeded into an 8-file layout")
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == n,
      "every row attributes to exactly one file")
    val total = orders
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .collect()(0).getDecimal(0)
    val fromFiles = rows.map(r =>
      new java.math.BigDecimal(r.getAs[Double]("total_price"))
        .setScale(2, java.math.RoundingMode.HALF_UP)).reduce(_ add _)
    assert(fromFiles.compareTo(total.setScale(2)) == 0,
      "per-file decimal totals must add to the table total")
  }

  test("q_time_changepoint: argmax matches an independent CUSUM recompute") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n")))
      .groupBy(_._1)
    val got = Maintain.qTimeChangepoint(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[java.sql.Timestamp]("cp_day").toString.take(10),
         r.getAs[Long]("max_abs_s"))).toMap
    daily.foreach { case (et, rows) =>
      val series = rows.sortBy(_._2).map(x => (x._2, x._3))
      val nd = series.length.toLong
      val tot = series.map(_._2).sum
      var p = 0L
      val scored = series.zipWithIndex.map { case ((day, x), i) =>
        p += x
        (day, math.abs(nd * p - (i + 1) * tot))
      }
      val best = scored.maxBy(s => (s._2, -s._1.hashCode))
      // ties break to the earliest day: re-scan for the first max
      val expect = scored.find(_._2 == scored.map(_._2).max).get
      assert(got(et) == ((expect._1, expect._2)),
        s"$et: expected changepoint $expect, got ${got(et)} ($best)")
    }
  }

  test("q_time_changepoint: a planted level shift is found at the shift") {
    // synthetic: 10 days at 100/day then 10 days at 200/day — CUSUM
    // must peak exactly at the last low day (S_t = n·P_t − t·T)
    val lows = (1 to 10).map(d => (f"2024-02-$d%02d", 100L))
    val highs = (11 to 20).map(d => (f"2024-02-$d%02d", 200L))
    val series = (lows ++ highs)
    val nd = series.length.toLong
    val tot = series.map(_._2).sum
    var p = 0L
    val scored = series.zipWithIndex.map { case ((day, x), i) =>
      p += x; (day, math.abs(nd * p - (i + 1) * tot))
    }
    val best = scored.find(_._2 == scored.map(_._2).max).get
    assert(best._1 == "2024-02-10",
      s"CUSUM must peak at the last pre-shift day, got $best")
  }

  test("q_text_zipf: slope negative everywhere and matches in-memory OLS") {
    val got = Maintain.qTextZipf(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("slope"))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (_, slope) =>
      assert(slope < 0.0, "rank-frequency slope must be negative")
    }
    // independent recompute for one source
    val src = got.keys.min
    val counts = Tables.documents(spark, sf)
      .where(col("source") === src)
      .select(explode(filter(split(col("text"), " "),
        t => length(t) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("cnt")))
      .sortBy(x => (-x._2, x._1)).take(300)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val k = terms.length.toDouble
    def dsum6(xs: Seq[Double]) = xs.map(x => BigDecimal(r6(x))).sum.toDouble
    val sx = dsum6(terms.map(_._1)); val sy = dsum6(terms.map(_._2))
    val sxx = dsum6(terms.map(t => t._1 * t._1))
    val sxy = dsum6(terms.map(t => t._1 * t._2))
    val slope = r6((k * sxy - sx * sy) / (k * sxx - sx * sx))
    assert(math.abs(got(src)._2 - slope) < 1e-9,
      s"$src: expected slope $slope, got ${got(src)._2}")
  }

  test("q_win_islands: streaks match an independent per-user recompute") {
    val got = Maintain.qWinIslands(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("n_islands"),
         r.getAs[Long]("max_streak"))).toMap
    val active = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay))
      .groupBy(_._1)
    active.foreach { case (u, rows) =>
      val days: Seq[Long] = rows.map(_._2).sorted.toSeq
      val nIslands = 1 + days.sliding(2).count {
        case Seq(a, b) => b != a + 1
        case _ => false
      }
      val maxStreak = {
        var best = 1L; var cur = 1L
        days.sliding(2).foreach {
          case Seq(a, b) =>
            if (b == a + 1) { cur += 1; best = math.max(best, cur) }
            else cur = 1
          case _ =>
        }
        best
      }
      assert(got(u) == ((days.length.toLong, nIslands.toLong, maxStreak)),
        s"user $u: expected (${days.length}, $nIslands, $maxStreak), got ${got(u)}")
    }
  }

  test("q_basket_lift: supports match a collected-basket recompute") {
    val got = Maintain.qBasketLift(spark, sf).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) ->
        (r.getAs[Long]("support"), r.getAs[Double]("lift"))).toMap
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.sorted).toMap
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    val expect = support.filter(_._2 >= 2)
    assert(got.keySet == expect.keySet,
      s"pair sets differ: ${got.keySet.size} vs ${expect.keySet.size}")
    expect.foreach { case (k, s0) => assert(got(k)._1 == s0) }
    // lift spot check: support * n_orders / (f1 * f2)
    if (got.nonEmpty) {
      val freq = baskets.values.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val n = baskets.size.toLong
      val ((p1, p2), (s0, lift)) = got.head
      val want = BigDecimal(s0.toDouble * n / (freq(p1) * freq(p2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lift - want) < 1e-9)
    }
  }

  test("q_scan_snapshot: v2 = v1 + delta − deletes, keys never resurrect") {
    val rows = Maintain.qScanSnapshot(spark, sf).collect()
      .map(r => r.getAs[Long]("version") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("total_price"))).toMap
    val orders = Tables.orders(spark, sf)
    val v1 = orders.where(col("o_orderkey") % 4 < 3).count()
    val v2 = orders.where(col("o_orderkey") % 10 =!= 7).count()
    assert(rows(1L)._1 == v1 && rows(2L)._1 == v2,
      s"snapshot counts drifted: $rows vs ($v1, $v2)")
    // the delete vector masks rows without touching data files: deleted
    // keys must be absent from a v2-equivalent read and present in v1
    val deleted = orders.where(col("o_orderkey") % 10 === 7).count()
    assert(v1 + orders.where(col("o_orderkey") % 4 === 3).count()
      - deleted == v2)
  }

  test("q_join_asof_nearest: matches a per-user in-memory recompute") {
    val got = Maintain.qJoinAsofNearest(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("click_id"), r.getAs[Long]("gap_us"))).toMap
    val evs = Tables.events(spark, sf)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = evs.groupBy(_._2)
    var checked = 0
    byUser.values.foreach { rows =>
      val clicks = rows.filter(_._4 == "click")
        .map(t => (t._3, t._1)).sorted // (us, id)
      rows.filter(_._4 == "purchase").foreach { case (pid, _, pus, _) =>
        if (clicks.nonEmpty) {
          // prev: strictly before in (us, id) order; next: strictly after
          val prev = clicks.filter(c =>
            c._1 < pus || (c._1 == pus && c._2 < pid)).lastOption
          val next = clicks.find(c =>
            c._1 > pus || (c._1 == pus && c._2 > pid))
          val want = (prev, next) match {
            case (Some(p), Some(n)) =>
              if (pus - p._1 <= n._1 - pus) (p._2, pus - p._1)
              else (n._2, n._1 - pus)
            case (Some(p), None) => (p._2, pus - p._1)
            case (None, Some(n)) => (n._2, n._1 - pus)
            case _ => sys.error("unreachable")
          }
          assert(got(pid) == want, s"purchase $pid: $want vs ${got(pid)}")
          checked += 1
        } else assert(!got.contains(pid))
      }
    }
    assert(checked > 0)
  }

  test("q_time_forecast: extrapolation matches an in-memory OLS") {
    val got = Maintain.qTimeForecast(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("day").toString.take(10)) ->
        r.getAs[Double]("yhat")).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("y")))
      .groupBy(_._1)
    daily.foreach { case (et, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sxx = rows.map(r => r._2 * r._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxy = rows.map(r => r._2 * r._3).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val maxx = rows.map(_._2).max
      (1 to 7).foreach { h =>
        val day = java.time.LocalDate.ofEpochDay(maxx + h).toString
        val want = BigDecimal(icept + slope * (maxx + h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((et, day)) - want) < 1e-9,
          s"$et +$h: ${got((et, day))} vs $want")
      }
    }
  }

  test("q_graph_adamic_adar: candidates are non-edges with real overlap") {
    val rows = Maintain.qGraphAdamicAdar(spark, sf).collect()
    assert(rows.nonEmpty)
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .alias("a").join(
        Tables.lineitem(spark, sf)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct().alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p"), col("b.p")).count()
      .where(col("count") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val pair = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      assert(!edges.contains(pair), s"predicted an existing edge $pair")
      assert(r.getAs[Long]("n_common") >= 1)
      assert(r.getAs[Double]("aa") > 0.0)
    }
  }

  test("q_agg_hist_eqdepth: buckets equal-depth within one row, bounds sorted") {
    val rows = Maintain.qAggHistEqdepth(spark, sf).collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    rows.foreach { case (pri, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("bucket"))
      assert(sorted.map(_.getAs[Long]("bucket")).toSeq ==
        (0L until sorted.length).toSeq, s"$pri: buckets not consecutive")
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1,
        s"$pri: equi-depth violated: ${ns.toSeq}")
      // bucket value ranges tile the domain in order
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9,
            s"$pri: bucket ranges overlap out of order")
        case _ =>
      }
    }
  }

  test("q_sample_consistent: membership matches the md5 rule exactly") {
    def heldOut(u: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      (h(0) & 0xFF) < 32
    }
    val got = Maintain.qSampleConsistent(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_holdout"), r.getAs[Long]("n_holdout_users"))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    evs.groupBy(_._1).foreach { case (et, rows) =>
      val ho = rows.filter(t => heldOut(t._2))
      assert(got(et) == ((ho.length.toLong, ho.map(_._2).distinct.length.toLong)),
        s"$et: ${got(et)} vs (${ho.length}, ${ho.map(_._2).distinct.length})")
    }
  }

  test("q_time_backtest: WAPE matches an in-memory recompute") {
    val got = Maintain.qTimeBacktest(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("wape"))
      .toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("y"))).groupBy(_._1)
    daily.foreach { case (et, rows) =>
      val cut = rows.map(_._2).max - 7
      val train = rows.filter(_._2 <= cut)
      val n = train.length.toDouble
      val sx = train.map(_._2).sum.toDouble
      val sxx = train.map(r => r._2 * r._2).sum.toDouble
      val sy = train.map(_._3).sum.toDouble
      val sxy = train.map(r => r._2 * r._3).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val test = rows.filter(_._2 > cut)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val sumAbs = test.map(r =>
        r6(math.abs(r._3.toDouble - (icept + slope * r._2)))).sum.toDouble
      val want = r6(sumAbs / test.map(_._3).sum.toDouble).toDouble
      assert(math.abs(got(et) - want) < 1e-9, s"$et: ${got(et)} vs $want")
    }
  }

  test("q_stats_power: n_per_arm matches the normal-approximation formula") {
    val got = Maintain.qStatsPower(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("s2"),
         r.getAs[Long]("n_per_arm"))).toMap
    val moments = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
        sum((col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("decimal(28,4)"))
          .cast("double").as("svv"))
      .collect()
    moments.foreach { r =>
      val (et, n, sv, svv) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3))
      val s2 = (svv - sv * sv / n) / (n - 1)
      val delta = sv / n * 0.05
      val z = 1.959963984540054 + 0.8416212335729143
      val want = math.ceil(z * z * 2.0 * s2 / (delta * delta)).toLong
      assert(got(et)._3 == want, s"$et: ${got(et)._3} vs $want")
      assert(got(et)._3 > 0 && got(et)._2 >= 0.0)
    }
  }

  test("q_dq_pk_gaps: key-space conservation and naive-recompute agreement") {
    val r = Maintain.qDqPkGaps(spark, sf).collect()(0)
    val (nKeys, minK, maxK, nGaps, maxGap, nMissing) =
      (r.getAs[Long]("n_keys"), r.getAs[Long]("min_key"),
       r.getAs[Long]("max_key"), r.getAs[Long]("n_gaps"),
       r.getAs[Long]("max_gap"), r.getAs[Long]("n_missing"))
    // conservation: the span is exactly keys + holes
    assert(maxK - minK + 1 == nKeys + nMissing,
      s"span ${maxK - minK + 1} != $nKeys keys + $nMissing missing")
    // naive single-pass recompute over the collected key set
    val ks = Tables.orders(spark, sf).select(col("o_orderkey"))
      .distinct().collect().map(_.getLong(0)).sorted
    val diffs = ks.sliding(2).collect {
      case Array(a, b) if b - a > 1 => b - a - 1 }.toSeq
    assert(nGaps == diffs.length && nMissing == diffs.sum &&
      maxGap == (if (diffs.isEmpty) 0L else diffs.max),
      s"block-stitched gaps disagree with the naive scan")
  }

  test("q_funnel_latency: rank-exact percentiles match an in-memory recompute") {
    val got = Maintain.qFunnelLatency(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("cohort").toString ->
        (r.getAs[Long]("n_converted"), r.getAs[Long]("p50_us"),
         r.getAs[Long]("p90_us"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val lats = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) =>
        t0.get(u).filter(us > _).map(s0 => (u, s0, us)) }
      .groupBy(t => (t._1, t._2))
      .map { case ((_, s0), rows) => (s0, rows.map(_._3).min - s0) }
    val byCohort = lats.groupBy { case (s0, _) =>
      // Monday-start week truncation in micros
      val day = java.time.Instant.ofEpochSecond(0)
        .plus(java.time.Duration.ofNanos(s0 * 1000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      day.`with`(java.time.DayOfWeek.MONDAY).atStartOfDay().toString
        .replace('T', ' ')
    }
    byCohort.foreach { case (cohort, rows) =>
      val sorted = rows.map(_._2).toSeq.sorted
      val n = sorted.length
      def pick(p: Double) = sorted(math.ceil(n * p).toInt - 1)
      val key = got.keys.find(_.startsWith(cohort.take(10))).get
      assert(got(key) == ((n.toLong, pick(0.5), pick(0.9))),
        s"cohort $cohort: ${got(key)} vs ($n, ${pick(0.5)}, ${pick(0.9)})")
    }
  }

  test("plans: aggregated-series windows, combiner-collapsed token exchange") {
    val cp = plan("q_time_changepoint")
    assert(cp.contains("partial_count"),
      "daily rollup must combine map-side before its exchange")
    val zipf = plan("q_text_zipf")
    assert(zipf.contains("partial_count"),
      "token counts must combine map-side before the token exchange")
    assert(!zipf.contains("CartesianProduct"))
    val inc = plan("q_agg_incremental_state")
    assert(inc.contains("partial_count") || inc.contains("partial_sum"),
      "delta partials must combine map-side")
    val lin = plan("q_scan_lineage")
    assert(lin.contains("partial_count"),
      "per-file meters must combine map-side (|files| rows shuffle)")
  }

  test("q_maintain_retention: expired partitions are gone from disk, kept intact") {
    val rows = Maintain.qMaintainRetention(spark, sf).collect()
      .map(r => (r.getAs[String]("omonth"), r.getAs[String]("status"),
        r.getAs[Long]("n_rows")))
    assert(rows.nonEmpty)
    // statuses partition the month axis at the cutoff
    rows.foreach { case (m, st, n) =>
      assert(if (m < "1997-01") st == "dropped" else st == "kept")
      assert(n > 0)
    }
    // row conservation: kept + dropped == source
    assert(rows.map(_._3).sum == Tables.orders(spark, sf).count())
    // the expired directories are REALLY gone; the kept ones remain
    val lake = java.nio.file.Paths.get(
      graft.queries.Relational.scratchDir("retention_lake", sf))
    val dirs = java.nio.file.Files.list(lake).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("omonth=")).toSet
    val expectKept = rows.filter(_._2 == "kept").map("omonth=" + _._1).toSet
    assert(dirs == expectKept,
      s"on-disk partitions ${dirs.size} != kept ${expectKept.size}")
  }

  test("q_stats_proptest: cohorts partition signups, z matches recompute") {
    val r = Maintain.qStatsProptest(spark, sf).collect()(0)
    val (n1, x1, n2, x2) = (r.getAs[Long]("n1"), r.getAs[Long]("x1"),
      r.getAs[Long]("n2"), r.getAs[Long]("x2"))
    assert(n1 > 0 && n2 > 0, "a degenerate cohort would make z undefined")
    assert(x1 <= n1 && x2 <= n2)
    // cohorts partition the signup population (q_funnel_window's total)
    val signups = Maintain.qFunnelWindow(spark, sf).collect()
      .map(_.getAs[Long]("n_signups")).sum
    assert(n1 + n2 == signups)
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val pp = (x1 + x2).toDouble / (n1 + n2)
    if (pp > 0.0 && pp < 1.0) {
      val z = BigDecimal((p1 - p2) /
          math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
    } else {
      // degenerate pooled rate (sf0.001: every user converts) → NULL z
      assert(r.isNullAt(r.fieldIndex("z")))
    }
  }

  test("q_funnel_window: converted ⊆ signups, rate identity, deadline honored") {
    val rows = Maintain.qFunnelWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, cvr) = (r.getAs[Long]("n_signups"),
        r.getAs[Long]("n_converted_7d"), r.getAs[Double]("cvr_7d"))
      assert(c >= 0 && c <= n)
      val expect = BigDecimal(c.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cvr - expect) < 1e-9)
    }
    // driver-side recompute of the total converted count
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val sevenDays = 7L * 24 * 3600 * 1000000L
    val conv = ev.filter(_._2 == "purchase").filter { case (u, _, us) =>
      t0.get(u).exists(s0 => us > s0 && us <= s0 + sevenDays)
    }.map(_._1).toSet
    assert(rows.map(_.getAs[Long]("n_converted_7d")).sum == conv.size.toLong)
    assert(rows.map(_.getAs[Long]("n_signups")).sum == t0.size.toLong)
  }

  test("q_win_median_smooth: med7 equals the sorted-window middle element") {
    val rows = Maintain.qWinMedianSmooth(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(rows.length >= 8)
    val revs = rows.map(_.getAs[Double]("rev"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val win = revs.slice(math.max(0, i - 6), i + 1).sorted
      val expect = win((win.length + 1) / 2 - 1)
      assert(r.getAs[Double]("med7") == expect,
        s"day $i: ${r.getAs[Double]("med7")} vs $expect")
    }
    // a median smoother is bounded by the window's extremes
    rows.zipWithIndex.foreach { case (r, i) =>
      val win = revs.slice(math.max(0, i - 6), i + 1)
      assert(r.getAs[Double]("med7") >= win.min &&
             r.getAs[Double]("med7") <= win.max)
    }
  }

  test("q_stats_theilsen: the selected slope is the rank-exact pair median") {
    val r = Maintain.qStatsTheilsen(spark, sf).collect()(0)
    val (nPairs, slope) =
      (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope_per_day"))
    val daily = Tables.orders(spark, sf)
      .where(year(col("o_orderdate")) === 1995)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(x => (x.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigDecimal(x.getDecimal(1))))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield ((daily(j)._2 - daily(i)._2).toDouble /
             (daily(j)._1 - daily(i)._1).toDouble,
             daily(i)._1, daily(j)._1)).sortBy(t => (t._1, t._2, t._3))
    assert(nPairs == slopes.length.toLong)
    val expect = BigDecimal(slopes((slopes.length + 1) / 2 - 1)._1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(slope - expect) < 1e-9, s"$slope vs $expect")
  }

  test("q_graph_assortativity: r in [-1,1], matches a driver-side recompute") {
    val r0 = Maintain.qGraphAssortativity(spark, sf).collect()(0)
    val (nEdges, r) =
      (r0.getAs[Long]("n_edges"), r0.getAs[Double]("assortativity"))
    assert(nEdges > 0 && nEdges % 2 == 0, "directed edge count must be even")
    assert(r >= -1.0 && r <= 1.0)
    // recompute from the raw co-purchase edge set
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = edges ++ edges.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xy = und.map { case (u, v) => (deg(u), deg(v)) }
    val n = xy.size.toDouble
    val sx = xy.map(_._1).sum.toDouble; val sy = xy.map(_._2).sum.toDouble
    val sxx = xy.map(t => t._1 * t._1).sum.toDouble
    val syy = xy.map(t => t._2 * t._2).sum.toDouble
    val sxy = xy.map(t => t._1 * t._2).sum.toDouble
    val expect = BigDecimal((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nEdges == und.size.toLong)
    assert(math.abs(r - expect) < 1e-9, s"$r vs recomputed $expect")
  }

  test("q_win_pareto: classes partition customers and revenue shares sum to 1") {
    val rows = Maintain.qWinPareto(spark, sf).collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSet.subsetOf(Set("A", "B", "C")))
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    val shareSum = rows.map(_.getAs[Double]("rev_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-5, s"shares sum to $shareSum")
    val totalRev = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .first().getDouble(0)
    assert(math.abs(rows.map(_.getAs[Double]("class_rev")).sum - totalRev) < 1e-6)
  }

  test("q_stats_moments: skewness/kurtosis match an exact driver recompute") {
    val rows = Maintain.qStatsMoments(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1))))
      .groupBy(_._1)
    rows.foreach { r =>
      val vs = raw(r.getAs[String]("event_type")).map(_._2)
      val n = vs.length.toDouble
      val s1 = vs.sum.toDouble; val s2 = vs.map(v => v * v).sum.toDouble
      val s3 = vs.map(v => v * v * v).sum.toDouble
      val s4 = vs.map(v => v * v * v * v).sum.toDouble
      val mu = s1 / n
      val m2 = s2 / n - mu * mu
      val m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
      val m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) -
        3.0 * mu * mu * mu * mu
      val skew = BigDecimal(m3 / (math.sqrt(m2) * m2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val kurt = BigDecimal(m4 / (m2 * m2) - 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("skewness") - skew) < 1e-9)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") - kurt) < 1e-9)
    }
  }

  test("q_time_xcorr: lag-0 r equals the driver-side Pearson of the two series") {
    val rows = Maintain.qTimeXcorr(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_days") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("r"))).toMap
    assert(rows.keySet == Set(0L, 1L, 7L))
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
           sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(rows(0L)._1 == daily.length.toLong)
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum.toDouble; val sy = daily.map(_._2).sum.toDouble
    val sxx = daily.map(t => t._1 * t._1).sum.toDouble
    val syy = daily.map(t => t._2 * t._2).sum.toDouble
    val sxy = daily.map(t => t._1 * t._2).sum.toDouble
    val expect = BigDecimal((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows(0L)._2 - expect) < 1e-9)
    // a lag drops exactly that many leading pairs
    assert(rows(1L)._1 == daily.length - 1L)
    assert(rows(7L)._1 == daily.length - 7L)
  }

  test("q_stats_kendall: concordance counts match the exact pair enumeration") {
    val r = Maintain.qStatsKendall(spark, sf).collect()(0)
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("y"))
      .collect().map(x => (x.getAs[Long]("x"), x.getAs[Long]("y")))
    var (c, dis, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val dx = daily(i)._1 - daily(j)._1; val dy = daily(i)._2 - daily(j)._2
      if (dx * dy > 0) c += 1
      else if (dx * dy < 0) dis += 1
      else if (dx == 0 && dy != 0) tx += 1
      else if (dy == 0 && dx != 0) ty += 1
    }
    val nP = daily.length.toLong * (daily.length - 1) / 2
    assert(r.getAs[Long]("n_pairs") == nP)
    assert(r.getAs[Long]("concordant") == c)
    assert(r.getAs[Long]("discordant") == dis)
    val tau = BigDecimal((c - dis).toDouble /
        math.sqrt(((nP - tx) * (nP - ty)).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("tau_b") - tau) < 1e-9)
  }

  test("q_agg_percentile_exact: p50 matches driver-side Type-7 interpolation") {
    val rows = Maintain.qAggPercentileExact(spark, sf).collect()
    assert(rows.nonEmpty)
    val cents = Tables.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val vs = cents(r.getAs[String]("event_type")).map(_._2).sorted
      def t7(p: Double): Double = {
        val pos = p * (vs.length - 1)
        val lo = pos.toInt; val f = pos - lo
        val hi = math.min(lo + 1, vs.length - 1)
        vs(lo) + (vs(hi) - vs(lo)) * f
      }
      assert(r.getAs[Long]("n") == vs.length.toLong)
      assert(math.abs(r.getAs[Double]("p50") -
        BigDecimal(t7(0.5)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9)
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("q_time_holt: forecasts are linear in h with the final trend slope") {
    val rows = Maintain.qTimeHolt(spark, sf).collect()
      .sortBy(_.getAs[Long]("h"))
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("h")).toSeq == (1L to 7L))
    val f = rows.map(_.getAs[Double]("forecast"))
    val step = f(1) - f(0)
    (1 until 6).foreach { i =>
      assert(math.abs((f(i + 1) - f(i)) - step) < 2e-6,
        s"non-linear step at h=${i + 1}")
    }
    val nDays = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts"))).distinct().count()
    assert(rows.head.getAs[Long]("n_days") == nDays)
  }

  test("q_stats_bootstrap: CI bounds replay from the LCG draw matrix exactly") {
    val r = Maintain.qStatsBootstrap(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_boot") == 200L)
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
      .orderBy("day").collect().map(_.getAs[Long]("cents"))
    val n = daily.length
    assert(r.getAs[Long]("n_days") == n.toLong)
    val means = (1 to 200).map { b =>
      val s = (1 to n).map { j =>
        val idx = ((1103515245L * (b.toLong * 100000L + j) + 12345L) %
          2147483648L % n).toInt
        daily(idx)
      }.sum
      s.toDouble / n
    }.sorted
    def t7(p: Double): Double = {
      val pos = p * (means.length - 1)
      val lo = pos.toInt; val f = pos - lo
      val hi = math.min(lo + 1, means.length - 1)
      means(lo) + (means(hi) - means(lo)) * f
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("ci_lo") - r4(t7(0.025))) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_hi") - r4(t7(0.975))) < 1e-9)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("boot_mean") &&
           r.getAs[Double]("boot_mean") <= r.getAs[Double]("ci_hi"))
  }

  test("q_graph_kcore: output equals a driver-side peel to fixpoint") {
    val got = Maintain.qGraphKcore(spark, sf).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("core_degree"))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = edges ++ edges.map(e => (e._2, e._1))
    var alive = und.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = und.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      val next = alive.filter(u => deg.getOrElse(u, 0) >= 2)
      changed = next.size != alive.size
      alive = next
    }
    val expect = und.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got == expect)
    got.values.foreach(d => assert(d >= 2L))
  }

  test("q_seq_paths: counts descend, paths draw from known event types") {
    val rows = Maintain.qSeqPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getAs[Long]("n_sessions"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      r.getAs[String]("path").split(">").foreach(t => assert(types(t)))
    }
    // top-20 session counts cannot exceed the total session count
    val totalSessions = graft.queries.Windows.qSessionize(spark, sf).count()
    assert(counts.sum <= totalSessions)
  }

  test("q_stats_mi: non-negative, bounded by min marginal entropy, exact replay") {
    val r = Maintain.qStatsMi(spark, sf).collect()(0)
    val (mi, nmi) = (r.getAs[Double]("mi_nats"), r.getAs[Double]("nmi"))
    assert(mi >= -1e-5, s"MI must be ~non-negative, got $mi")
    assert(nmi >= -1e-5 && nmi <= 1.0 + 1e-5)
  }

  test("q_stats_wilson: interval brackets p_hat and stays inside [0,1]") {
    val rows = Maintain.qStatsWilson(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, p) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
        r.getAs[Double]("p_hat"))
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9, s"Wilson CI outside [0,1]: $lo..$hi")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"p_hat $p outside CI $lo..$hi")
      assert(r.getAs[Long]("x") <= r.getAs[Long]("n"))
    }
  }

  test("q_stats_levene: F matches a driver-side Brown-Forsythe recompute") {
    val r = Maintain.qStatsLevene(spark, sf).collect()(0)
    val groups = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    def t7med(vs: Array[Long]): Double = {
      val pos = 0.5 * (vs.length - 1)
      val lo = pos.toInt; val f = pos - lo
      val hi = math.min(lo + 1, vs.length - 1)
      vs(lo) + (vs(hi) - vs(lo)) * f
    }
    val z = groups.map { case (g, vs) =>
      val m = t7med(vs); g -> vs.map(v => math.abs(v - m))
    }
    val k = z.size.toDouble
    val nTot = z.values.map(_.length).sum.toDouble
    val sb = z.values.map { zs =>
      val s = zs.sum
      BigDecimal(s * s / zs.length.toDouble)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val sAll = z.values.map(_.sum).sum
    val ssAll = z.values.flatMap(_.map(x => BigDecimal(x) * BigDecimal(x))).sum.toDouble
    val f = ((sb - sAll * sAll / nTot) / (k - 1)) /
      ((ssAll - sb) / (nTot - k))
    val expect = BigDecimal(f).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(r.getAs[Long]("k") == z.size.toLong)
    assert(math.abs(r.getAs[Double]("f_stat") - expect) < 1e-6,
      s"${r.getAs[Double]("f_stat")} vs $expect")
  }

  test("q_dq_key_skew: max >= p99 >= p50 and skew factor replays") {
    val r = Maintain.qDqKeySkew(spark, sf).collect()(0)
    assert(r.getAs[Long]("max_rows") >= r.getAs[Double]("p99").toLong)
    assert(r.getAs[Double]("p99") >= r.getAs[Double]("p50"))
    val mean = r.getAs[Long]("n_rows").toDouble / r.getAs[Long]("n_keys")
    val expect = BigDecimal(r.getAs[Long]("max_rows") / mean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("skew_factor") - expect) < 1e-9)
  }

  test("q_time_peaks: every peak strictly beats both neighbors and the bar") {
    val peaks = Maintain.qTimePeaks(spark, sf).collect()
      .map(r => r.getAs[java.sql.Timestamp]("day").getTime).toSet
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("cents")))
    assert(peaks.nonEmpty)
    daily.indices.drop(1).dropRight(1).foreach { i =>
      val isLocMax = daily(i)._2 > daily(i - 1)._2 &&
        daily(i)._2 > daily(i + 1)._2
      val med = {
        val win = daily.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
        val pos = 0.5 * (win.length - 1); val lo = pos.toInt
        val f = pos - lo; val hi = math.min(lo + 1, win.length - 1)
        win(lo) + (win(hi) - win(lo)) * f
      }
      val expected = isLocMax && daily(i)._2 * 100.0 >= med * 102.0
      assert(peaks.contains(daily(i)._1) == expected, s"day index $i")
    }
  }

  test("q_stats_simpson: cells partition the events and ALL row is self-consistent") {
    val rows = Maintain.qStatsSimpson(spark, sf).collect()
    val all = rows.find(_.getAs[String]("stratum") == "ALL").get
    assert(!all.getAs[Boolean]("reversed"), "ALL cannot reverse against itself")
    val strata = rows.filter(_.getAs[String]("stratum") != "ALL")
    assert(strata.map(_.getAs[Long]("n1")).sum == all.getAs[Long]("n1"))
    assert(strata.map(_.getAs[Long]("n2")).sum == all.getAs[Long]("n2"))
    val nEvents = Tables.events(spark, sf).count()
    assert(all.getAs[Long]("n1") + all.getAs[Long]("n2") == nEvents)
    // purchase stratum: every event is a hit for its cohort
    strata.filter(_.getAs[String]("stratum") == "purchase").foreach { r =>
      assert(r.getAs[Long]("x1") == r.getAs[Long]("n1"))
      assert(r.getAs[Long]("x2") == r.getAs[Long]("n2"))
    }
  }

  test("q_stats_effect: Cliff's delta replays from the exact pair count") {
    val r = Maintain.qStatsEffect(spark, sf).collect()(0)
    val vals = Tables.events(spark, sf)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val clicks = vals.filter(_._1 == "click").map(_._2)
    val views = vals.filter(_._1 == "view").map(_._2)
    assert(r.getAs[Long]("n1") == clicks.length.toLong)
    assert(r.getAs[Long]("n2") == views.length.toLong)
    var gt = 0L; var lt = 0L
    for (c <- clicks; v <- views) {
      if (c > v) gt += 1 else if (c < v) lt += 1
    }
    val delta = BigDecimal((gt - lt).toDouble /
        (clicks.length.toLong * views.length).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("cliffs_delta") - delta) < 1e-9,
      s"${r.getAs[Double]("cliffs_delta")} vs $delta")
    assert(math.abs(r.getAs[Double]("cohens_d")) < 10.0)
  }

  test("q_profile_freq: per-column top-3 by exact counts, ranks dense") {
    val rows = Maintain.qProfileFreq(spark, sf).collect()
    val byCol = rows.groupBy(_.getAs[String]("column"))
    assert(byCol.keySet ==
      Set("o_orderstatus", "o_orderpriority", "order_year"))
    byCol.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length))
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
    // counts agree with a direct groupBy
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    byCol("o_orderpriority").foreach { r =>
      assert(direct(r.getAs[String]("value")) == r.getAs[Long]("n"))
    }
  }

  test("q_sample_neyman: allocation sums to 1000 and respects Neyman weights") {
    val rows = Maintain.qSampleNeyman(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_sampled")).sum == 1000L)
    // strata partition the order population
    assert(rows.map(_.getAs[Long]("n_stratum")).sum ==
      Tables.orders(spark, sf).count())
    // allocation proportional to N_h * sd_h (largest-remainder): verify
    // against a driver-side recompute of the weights
    val g = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val w = g.map { case (k, vs0) =>
      val vs = vs0.map(_._2)
      val n = vs.length.toDouble
      val s = vs.sum.toDouble
      val ss = vs.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
      k -> n * math.sqrt((ss - s * s / n) / (n - 1))
    }
    val wSum = w.values.sum
    val shares = w.view.mapValues(_ * 1000 / wSum).toMap
    val baseN = shares.view.mapValues(s => math.floor(s).toLong).toMap
    val leftover = 1000L - baseN.values.sum
    val byRem = shares.map { case (k, s) => (k, s - math.floor(s)) }
      .toSeq.sortBy { case (k, r) => (-r, k) }
    val expect = baseN ++ byRem.take(leftover.toInt)
      .map { case (k, _) => k -> (baseN(k) + 1) }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") ==
        expect(r.getAs[String]("stratum")),
        s"stratum ${r.getAs[String]("stratum")}")
    }
  }

  test("q_rank_rbo: bounded by [0,1] and consistent with the k overlap") {
    val r = Maintain.qRankRbo(spark, sf).collect()(0)
    val (rbo, ov) = (r.getAs[Double]("rbo_min"), r.getAs[Long]("overlap_at_k"))
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-9)
    assert(ov >= 0L && ov <= 20L)
    // identical lists would give rbo_min = sum((1-p) p^(d-1)) < 1;
    // the overlap fraction at k upper-bounds nothing, but zero overlap
    // forces rbo = 0
    if (ov == 0L) assert(rbo == 0.0)
    if (rbo > 0.0) assert(ov > 0L)
  }

  test("q_text_repetition: ratios replay from a driver-side token walk") {
    val rows = Maintain.qTextRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)
        .split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 3).groupBy(_._1)
    rows.foreach { r =>
      val g = docs(r.getAs[String]("lang")).map(_._2)
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val rep3s = g.map { ts =>
        val grams = ts.sliding(3).map(_.mkString(" ")).toSeq
        r6(1.0 - grams.distinct.length.toDouble / grams.length)
      }
      val shares = g.map { ts =>
        r6(ts.groupBy(identity).values.map(_.size).max.toDouble / ts.length)
      }
      val expRep = r6((rep3s.sum / g.length).toDouble).toDouble
      val expShare = r6((shares.sum / g.length).toDouble).toDouble
      assert(math.abs(r.getAs[Double]("avg_rep3") - expRep) < 1e-9)
      assert(math.abs(r.getAs[Double]("avg_top_share") - expShare) < 1e-9)
      val flagged = rep3s.zip(shares)
        .count { case (a, b) => a.toDouble > 0.2 || b.toDouble > 0.1 }
      assert(r.getAs[Long]("n_flagged") == flagged.toLong)
    }
  }

  test("q_stats_runs: run count matches a driver-side sign walk") {
    val r = Maintain.qStatsRuns(spark, sf).collect()(0)
    val cents = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("c"))
      .orderBy("day").collect().map(_.getAs[Long]("c"))
    val sgns = cents.zip(cents.tail).map { case (a, b) => b - a }
      .filter(_ != 0L).map(d => if (d > 0) 1 else -1)
    val runs = if (sgns.isEmpty) 0
      else 1 + sgns.zip(sgns.tail).count { case (a, b) => a != b }
    assert(r.getAs[Long]("n_up") == sgns.count(_ == 1).toLong)
    assert(r.getAs[Long]("n_down") == sgns.count(_ == -1).toLong)
    assert(r.getAs[Long]("runs") == runs.toLong)
    assert(r.getAs[Long]("runs") <= sgns.length.toLong)
  }

  test("q_text_udiv: KL is non-negative and a uniform corpus doc scores ~0") {
    val rows = Maintain.qTextUdiv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Gibbs: KL(p_doc || p_corpus) >= 0 up to the 6-dp term rounding
      assert(r.getAs[Double]("avg_kl") >= -1e-4,
        s"lang ${r.getAs[String]("lang")}: avg KL ${r.getAs[Double]("avg_kl")}")
      assert(r.getAs[Double]("max_kl") >= r.getAs[Double]("avg_kl") - 1e-9)
    }
    val nDocs = Tables.documents(spark, sf)
      .where(size(filter(split(col("text"), " "), t => t =!= "")) > 0)
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  test("q_eval_lift: deciles partition users, top decile lift >= 1 ordering") {
    val rows = Maintain.qEvalLift(spark, sf).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    // the last cumulative lift covers everyone → exactly 1
    assert(math.abs(rows.last.getAs[Double]("cum_lift") - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchasers") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Double]("rate") >= 0.0 &&
             r.getAs[Double]("rate") <= 1.0)
    }
  }

  test("q_time_stl: weekday indices cover Mon-Sun and roughly center on zero") {
    val rows = Maintain.qTimeStl(spark, sf).collect()
      .sortBy(_.getAs[Int]("dow"))
    assert(rows.map(_.getAs[Int]("dow")).toSet.subsetOf((0 to 6).toSet))
    assert(rows.nonEmpty)
    // detrended means sum ≈ 0 weighted by day counts (the MA removes
    // the level, so weekday effects must cancel up to edge effects)
    val weighted = rows.map(r =>
      r.getAs[Double]("seasonal") * r.getAs[Long]("n_days")).sum
    val totalDays = rows.map(_.getAs[Long]("n_days")).sum
    assert(math.abs(weighted / totalDays) < 50.0,
      s"seasonal indices far from centered: $weighted over $totalDays days")
    val sd = rows.head.getAs[Double]("resid_sd")
    assert(sd >= 0.0)
    assert(rows.forall(_.getAs[Double]("resid_sd") == sd))
  }

  test("q_eval_auc: matches an exact driver-side pair count") {
    val r = Maintain.qEvalAuc(spark, sf).collect()(0)
    val users = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("score"),
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .collect()
      .map(x => (x.getAs[Long]("score"), x.getAs[Long]("np") * 5 > x.getAs[Long]("n")))
    val pos = users.filter(_._2).map(_._1)
    val neg = users.filterNot(_._2).map(_._1)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    var u2 = 0L
    for (p <- pos; q <- neg) {
      if (p > q) u2 += 2 else if (p == q) u2 += 1
    }
    val expect = BigDecimal(u2.toDouble /
        (2.0 * pos.length * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("auc") - expect) < 1e-9,
      s"${r.getAs[Double]("auc")} vs $expect")
  }

  test("q_eval_confusion: cells partition users; F1 is the PR harmonic mean") {
    val r = Maintain.qEvalConfusion(spark, sf).collect()(0)
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(tp + fp + fn + tn == nUsers)
    val (p, rr) = (r.getAs[Double]("precision"), r.getAs[Double]("recall"))
    assert(math.abs(r.getAs[Double]("f1") -
      BigDecimal(2.0 * (tp.toDouble / (tp + fp)) * (tp.toDouble / (tp + fn)) /
        ((tp.toDouble / (tp + fp)) + (tp.toDouble / (tp + fn))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(p >= 0 && p <= 1 && rr >= 0 && rr <= 1)
    assert(r.getAs[Double]("or_ci_lo") <= r.getAs[Double]("odds_ratio"))
    assert(r.getAs[Double]("odds_ratio") <= r.getAs[Double]("or_ci_hi"))
  }

  test("q_olap_parent_share: shares sum to 1 within every parent level") {
    val rows = Maintain.qOlapParentShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("region")).foreach { case (reg, g) =>
      val s = g.map(_.getAs[Double]("share_of_region")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"region $reg shares sum to $s")
      // region share is constant within the region
      assert(g.map(_.getAs[Double]("region_share_of_world")).distinct
        .length == 1)
    }
    val regionShares = rows.groupBy(_.getAs[String]("region"))
      .map(_._2.head.getAs[Double]("region_share_of_world")).sum
    assert(math.abs(regionShares - 1.0) < 1e-4)
  }

  test("q_time_business_days: formula matches a driver-side calendar walk") {
    val got = Maintain.qTimeBusinessDays(spark, sf).collect()
      .map(r => (r.getAs[Long]("business_days"),
        r.getAs[Long]("n_lineitems"))).toMap
    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderdate").cast("date"),
        col("l_shipdate").cast("date"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
    val expect = pairs.map { case (ord, ship) =>
      // literal walk: count Mon-Fri days in [ord, ship) (negated when
      // ship < ord) — the ground truth the closed form must match
      val (a, b, sign) =
        if (!ship.isBefore(ord)) (ord, ship, 1L) else (ship, ord, -1L)
      var d = a; var n = 0L
      while (d.isBefore(b)) {
        if (d.getDayOfWeek.getValue <= 5) n += 1
        d = d.plusDays(1)
      }
      sign * n
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect)
  }

  test("q_seq_vshape: every reported V replays from a driver-side sign walk") {
    val got = Maintain.qSeqVshape(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("trough_day").getTime,
        r.getAs[Long]("down_len"), r.getAs[Long]("up_len")))
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("c"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("c")))
    // driver-side: run-length encode the non-flat directions
    val moves = daily.zip(daily.tail).filter(p => p._2._2 != p._1._2)
      .map { case ((_, a), (day, b)) => (day, if (b > a) 1 else -1) }
    val runs = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long)] // (sgn, len, endDay)
    moves.foreach { case (day, s) =>
      if (runs.nonEmpty && runs.last._1 == s) {
        val (sg, l, _) = runs.remove(runs.length - 1)
        runs += ((sg, l + 1, day))
      } else runs += ((s, 1L, day))
    }
    val expect = runs.toSeq.zip(runs.toSeq.tail).collect {
      case ((-1, dl, trough), (1, ul, _)) if dl >= 2 && ul >= 2 =>
        (trough, dl, ul)
    }
    assert(got.toSeq.sortBy(_._1) == expect.sortBy(_._1))
  }

  test("q_win_drawdown: the reported drawdown is the argmax over the walk") {
    val r = Maintain.qWinDrawdown(spark, sf).collect()(0)
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "error",
          -col("value").cast("decimal(18,2)"))
        .otherwise(col("value").cast("decimal(18,2)"))) * 100)
        .cast("long").as("net"))
      .orderBy("day").collect().map(_.getAs[Long]("net"))
    var cum = 0L; var peak = Long.MinValue; var best = Long.MinValue
    daily.foreach { n =>
      cum += n; peak = math.max(peak, cum)
      best = math.max(best, peak - cum)
    }
    assert(r.getAs[Long]("max_drawdown_cents") == best)
    assert(r.getAs[Long]("max_drawdown_cents") >= 0L)
  }

  test("q_split_temporal: buckets partition events; embargo really separates") {
    val r = Maintain.qSplitTemporal(spark, sf).collect()(0)
    val total = Tables.events(spark, sf).count()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") +
      r.getAs[Long]("n_embargoed") == total)
    assert(r.getAs[Long]("n_train") > 0L)
    // the embargo zone is 2 days + the cutoff boundary: recompute from
    // raw timestamps that train max < test min by MORE than the embargo
    val us = Tables.events(spark, sf)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    val day0 = {
      val t = new java.sql.Timestamp(us.min / 1000)
      val c = java.time.Instant.ofEpochMilli(t.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      c.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000
    }
    val cut = day0 + 21L * 86400 * 1000000
    val emb = 2L * 86400 * 1000000
    assert(r.getAs[Long]("n_train") == us.count(_ < cut - emb).toLong)
    assert(r.getAs[Long]("n_test") == us.count(_ > cut).toLong)
  }

  test("q_embed_outliers: ~5% flagged overall, outliers bounded per label") {
    val rows = Maintain.qEmbedOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVecs = rows.map(_.getAs[Long]("n_vecs")).sum
    val nOut = rows.map(_.getAs[Long]("n_outliers")).sum
    assert(nVecs == Tables.embeddings(spark, sf).count())
    // strict < on the p05 threshold flags AT MOST 5% (ties excluded)
    assert(nOut <= (nVecs * 0.05).ceil.toLong + 1,
      s"$nOut of $nVecs flagged")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Double]("min_cos") <= 1.0 + 1e-9)
    }
  }

  test("q_win_rolling_corr: r bounded, short windows null, day-30 replays") {
    val rows = Maintain.qWinRollingCorr(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_window")
      if (n < 4) assert(r.isNullAt(r.fieldIndex("rolling_r")))
      else {
        val v = r.getAs[Double]("rolling_r")
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
      }
    }
    // last day's window replays driver-side
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val win = daily.takeRight(math.min(14, daily.length))
    val n = win.length.toDouble
    val sx = win.map(_._1).sum.toDouble; val sy = win.map(_._2).sum.toDouble
    val sxx = win.map(t => t._1 * t._1).sum.toDouble
    val syy = win.map(t => t._2 * t._2).sum.toDouble
    val sxy = win.map(t => t._1 * t._2).sum.toDouble
    val expect = BigDecimal((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.last.getAs[Double]("rolling_r") - expect) < 1e-9)
  }

  test("q_time_user_growth: totals are the running sum and cover every user") {
    val rows = Maintain.qTimeUserGrowth(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.last.getAs[Long]("total_users") == nUsers)
    var running = 0L
    rows.foreach { r =>
      running += r.getAs[Long]("new_users")
      assert(r.getAs[Long]("total_users") == running)
    }
    assert(rows.head.isNullAt(rows.head.fieldIndex("growth_rate")))
  }

  test("q_agg_stickiness: avg_dau <= mau and the ratio replays exactly") {
    val rows = Maintain.qAggStickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, mau) = (r.getAs[Long]("n_days"), r.getAs[Long]("mau"))
      val (avgDau, st) =
        (r.getAs[Double]("avg_dau"), r.getAs[Double]("stickiness"))
      assert(avgDau <= mau.toDouble + 1e-9)
      assert(st > 0.0 && st <= 1.0 + 1e-9)
      assert(math.abs(st - BigDecimal(avgDau * nDays / (nDays * mau).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-3)
    }
  }
}

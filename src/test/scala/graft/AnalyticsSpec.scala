package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics

/** Round-14 analytics operators: URL parse/canonicalize-dedup, exact
  * order statistics, sketch quantiles, PageRank. The DuckDB oracle gate
  * cross-checks all five against independent SQL re-derivations every
  * driver run; these specs assert the semantic properties the hash
  * compare can't express (tolerance contracts, variant unification,
  * convergence sanity) on the sf0.001 data.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_fn_url extracts every URL component") {
    val rows = Analytics.qFnUrl(spark, sf).collect()
    assert(rows.nonEmpty)
    // doc_id 1 -> variant 1: uppercase scheme/host, explicit :443, slash
    val v1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
    assert(v1.getAs[String]("scheme") == "https")
    assert(v1.getAs[String]("host") == "www.cdn.example.com")
    assert(v1.getAs[String]("path") == "/article/1/")
    assert(v1.getAs[String]("query") == "")
    // doc_id 2 -> variant 2: utm query
    val v2 = rows.find(_.getAs[Long]("doc_id") == 2L).get
    assert(v2.getAs[String]("utm_source") == "feed")
    assert(v2.getAs[String]("query") == "utm_source=feed&utm_campaign=c7")
    // doc_id 3 -> variant 3: index.html + fragment
    val v3 = rows.find(_.getAs[Long]("doc_id") == 3L).get
    assert(v3.getAs[String]("path") == "/article/3/index.html")
    assert(v3.getAs[String]("fragment") == "top")
    // form codec round-trip constants
    assert(v1.getAs[String]("decoded") == "a b/c")
    assert(v1.getAs[String]("encoded") == "a+b%2Fc")
  }

  test("q_dedup_url unifies all four spelling variants of an article") {
    val out = Analytics.qDedupUrl(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.documents(spark, sf).count()
    assert(total == nDocs, "dedup must partition the corpus")
    // canonical form: lowercase, no www/port/index.html/utm/fragment
    assert(out.forall { r =>
      val u = r.getAs[String]("canonical_url")
      u.startsWith("https://cdn.example.com/article/") &&
        !u.contains("www.") && !u.contains(":443") &&
        !u.contains("index.html") && !u.contains("utm_") &&
        !u.contains("#") && !u.endsWith("/")
    })
    // sf0.001 has 500 docs over 97 article slots: at least one article
    // collects docs from >1 variant class and they must land together
    assert(out.exists(_.getAs[Long]("n_docs") > 1L))
    // keep_id is the minimum member: article k keeps the smallest doc_id
    // whose doc_id % 97 == k
    val kept = out.map { r =>
      val art = r.getAs[String]("canonical_url")
        .stripPrefix("https://cdn.example.com/article/").toLong
      (art, r.getAs[Long]("keep_id"))
    }
    assert(kept.forall { case (art, keep) => keep % 97 == art })
  }

  test("q_agg_mode_median matches a brute-force recomputation") {
    val out = Analytics.qAggModeMedian(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    out.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val qs = li.filter(_._1 == flag).map(_._2)
      val byCount = qs.groupBy(identity).view.mapValues(_.length).toMap
      val best = byCount.toSeq.sortBy { case (v, c) => (-c, v) }.head
      assert(r.getAs[Double]("mode_qty") == best._1)
      assert(r.getAs[Long]("mode_n") == best._2.toLong)
      val sorted = qs.sorted
      val n = sorted.length
      val med =
        if (n % 2 == 1) sorted(n / 2)
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      assert(math.abs(r.getAs[Double]("med_qty") - med) < 1e-6)
    }
  }

  test("q_agg_quantile_sketch stays inside the rank-error contract") {
    val out = Analytics.qAggQuantileSketch(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ok_p50"), s"p50 out of tolerance: $r")
      assert(r.getAs[Boolean]("ok_p95"), s"p95 out of tolerance: $r")
      assert(r.getAs[Double]("exact_p50") > 0.0)
    }
  }

  test("q_join_null_anti honors three-valued NOT IN semantics") {
    val out = Analytics.qJoinNullAnti(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> r.getAs[Long]("n")).toMap
    // one NULL in the subquery empties a NOT IN entirely
    assert(out("subquery_has_null") == 0L)
    // NULL probe keys can never pass NOT IN: the survivor count must
    // equal the brute-force count over non-null keys only
    val cust = Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val hot = Tables.orders(spark, sf)
      .where(org.apache.spark.sql.functions.col("o_totalprice") > 400000)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = cust.count(k => k % 50 != 0 && !hot.contains(k))
    assert(out("probe_nullable") == expected.toLong)
    // the plan must be the null-aware anti join, not a nested loop
    val plan = Analytics.qJoinNullAnti(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(500))
  }

  test("q_agg_bitmap_distinct equals exact count(DISTINCT)") {
    val out = Analytics.qAggBitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val exact = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_partkey").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).distinct.length.toLong).toMap
    assert(out == exact)
  }

  test("q_dq_outliers flags exactly the rows beyond 1.5 MAD") {
    val out = Analytics.qDqOutliers(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val med = r.getAs[Double]("med")
      val mad = r.getAs[Double]("mad")
      assert(mad > 0.0)
      val flag = r.getAs[String]("l_returnflag")
      val xs = Tables.lineitem(spark, sf)
        .where(org.apache.spark.sql.functions.col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0))
      // med/mad are rounded to 6 decimals in the output; re-derive the
      // outlier count with a tolerance window around the boundary
      val n = xs.count(x => math.abs(x - med) > 1.5 * mad + 1e-4)
      val m = xs.count(x => math.abs(x - med) > 1.5 * mad - 1e-4)
      val got = r.getAs[Long]("n_outliers")
      assert(got >= n && got <= m, s"$flag: $got not in [$n,$m]")
    }
  }

  test("q_fn_variant extracts typed fields and pins the variant schema") {
    val rows = Analytics.qFnVariant(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("vschema") == "OBJECT<k: BIGINT>")
      assert(r.getAs[Boolean]("null_probe"))
      assert(r.getAs[Long]("k_mod") == r.getAs[Long]("k") % 7)
    }
  }

  test("q_agg_hll_merge: merged sketch estimate within 5% of exact") {
    val out = Analytics.qAggHllMerge(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ok_est"), s"estimate out of tolerance: $r")
      assert(r.getAs[Long]("n_exact") > 0L)
    }
  }

  test("q_sample_reservoir draws exactly k per language, hash-ordered") {
    val out = Analytics.qSampleReservoir(spark, sf).collect()
    val perLang = out.groupBy(_.getAs[String]("lang"))
    val langSizes = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, rows) =>
      val expected = math.min(20L, langSizes(lang))
      assert(rows.length.toLong == expected, s"$lang: ${rows.length}")
      // ranks are 1..k and the hash order is deterministic: re-running
      // returns the identical membership
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to expected).toSeq)
    }
    val again = Analytics.qSampleReservoir(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    assert(again == out.map(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet)
  }

  test("q_time_downsample buckets on epoch-aligned 7-day windows") {
    import org.apache.spark.sql.functions._
    val out = Analytics.qTimeDownsample(spark, sf).collect()
    assert(out.nonEmpty)
    // every bucket start is a whole multiple of 7 days from the epoch
    out.foreach { r =>
      val us = r.getAs[java.sql.Timestamp]("wk").getTime
      assert(us % (7L * 24 * 3600 * 1000) == 0, s"unaligned bucket: $r")
    }
    // counts partition the table
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("q_scan_merge_schema null-fills the column absent from v1 files") {
    val out = Analytics.qScanMergeSchema(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val n = r.getAs[Long]("n")
      val scored = r.getAs[Long]("n_scored")
      // odd orderkeys carry priority_score (v2 generation), even don't
      if (b % 2 == 1) assert(scored == n, s"odd bucket fully scored: $r")
      else assert(scored == 0L, s"even bucket unscored: $r")
    }
  }

  test("q_graph_pagerank matches a driver-side power iteration") {
    val out = Analytics.qGraphPagerank(spark, sf).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    assert(out.nonEmpty)
    // recompute the same 5 damped iterations from the raw events
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = ev.withColumn("dst", lead(col("event_type"), 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("w")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = out.keySet
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, ww) =>
          rank(src) * ww.toDouble / outw(src).toDouble
        }.sum
      }
      rank = nodes.map(v => v -> (0.15 / n + 0.85 * contrib.getOrElse(v, 0.0)))
        .toMap
    }
    nodes.foreach { v =>
      assert(math.abs(out(v) - rank(v)) < 1e-5, s"node $v: ${out(v)} vs ${rank(v)}")
    }
    // damped-PageRank invariant: total mass = (1-d) + d * passed mass <= 1
    val mass = out.values.sum
    assert(mass > 0.15 && mass <= 1.0 + 1e-9)
  }

  test("q_graph_triangles: counts are closed wedges of a degree-capped graph") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.qGraphTriangles(spark, sf).collect()
    assert(rows.nonEmpty, "fixture graph must close at least one triangle")
    // every participation count is a positive multiple of a whole
    // triangle's contribution to one node
    rows.foreach(r => assert(r.getAs[Long]("n_tri") >= 1L))
    // output ordering is the deterministic (n_tri DESC, node ASC) total
    val pairs = rows.map(r => (r.getAs[Long]("n_tri"), r.getAs[Long]("node")))
    assert(pairs.sameElements(pairs.sortBy { case (n, v) => (-n, v) }))
    // the filtered-aggregate surface: booleans and anchors agree with a
    // direct computation
    val f = Analytics.qAggFiltered(spark, sf).collect()
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("nf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    f.foreach { r =>
      assert(r.getAs[Long]("n_finished") == direct(r.getString(0)),
             "count_if must equal the explicit conditional sum")
      assert(r.getAs[Boolean]("all_positive"))
    }
  }

  test("q_agg_cms: estimates deterministic, one-sided, and inside the published bound") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.qAggCms(spark, sf).collect()
    assert(rows.length ==
           Tables.customer(spark, sf).select("c_nationkey").distinct().count().toInt)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok_lower"), "CMS never under-counts")
      assert(r.getAs[Boolean]("ok_upper"),
             s"nation ${r.get(0)}: estimate above the eps*N bound")
    }
    // determinism: the fixed-seed sketch probes identically across runs
    val again = Analytics.qAggCms(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_graph_bfs hops match a driver-side BFS over the same top-2 graph") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rows = Analytics.qGraphBfs(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("hops")).toMap
    assert(rows(0L) == 0L, "source node is at distance 0")
    // independent edge derivation + classic queue BFS on the driver
    val cn = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("src"))
    val sn = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("s_nationkey").as("dst"))
    val edges = cn.join(sn, col("o_orderkey") === col("l_orderkey"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("cnt").desc, col("dst").asc)))
      .where(col("rk") <= 2)
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = scala.collection.mutable.Map(0L -> 0L)
    val queue = scala.collection.mutable.Queue(0L)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      edges.getOrElse(u, Array.empty[Long]).foreach { v =>
        if (!dist.contains(v)) { dist(v) = dist(u) + 1; queue += v }
      }
    }
    val nations = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))
    nations.foreach { n =>
      assert(rows(n) == dist.getOrElse(n, -1L),
             s"nation $n: iterative-join BFS must equal queue BFS")
    }
  }

  test("q_skyline: frontier is exactly the non-dominated (price,size) set per brand") {
    import org.apache.spark.sql.functions._
    val frontier = Analytics.qSkyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val parts = Tables.part(spark, sf)
      .select(col("p_brand"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2).toLong))
    def dominated(brand: String, price: Double, size: Long): Boolean =
      parts.exists { case (b, p, s) =>
        b == brand && p <= price && s >= size && (p < price || s > size) }
    // every frontier point exists in the data and is non-dominated
    frontier.foreach { case (b, p, s) =>
      assert(parts.contains((b, p, s)), s"($b,$p,$s) not a real part point")
      assert(!dominated(b, p, s), s"($b,$p,$s) is dominated")
    }
    // completeness: every non-dominated point is on the frontier
    val want = parts.distinct.filterNot { case (b, p, s) => dominated(b, p, s) }
    assert(frontier.toSet == want.toSet)
  }

  test("q_agg_weighted_median: two-phase bucket resolve equals a driver-side scan") {
    import org.apache.spark.sql.functions._
    val got = Analytics.qAggWeightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
              col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val wmed = sorted.find { t => cum += t._3; cum * 2 >= tot }.get._2
      assert(got(flag) == ((wmed, tot)), s"flag $flag")
    }
  }

  test("q_assign_ids: dense 0..n-1 ids, monotone in the key") {
    val rows = Analytics.qAssignIds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).toSeq == (0L until rows.length).toSeq,
           "ids must be dense and aligned with key order")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // reproducible across invocations despite sampled range boundaries
    val again = Analytics.qAssignIds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q_agg_hll_intersect: inclusion-exclusion identity and bounds hold") {
    val rows = Analytics.qAggHllIntersect(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok_a") && r.getAs[Boolean]("ok_b") &&
             r.getAs[Boolean]("ok_i"),
             s"${r.get(0)}: sketch estimate outside the 7% bound")
      // intersection can never exceed either cohort
      assert(r.getAs[Long]("exact_i") <=
             math.min(r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b")))
    }
    // determinism: HLL registers are per-bucket maxima — order-free
    val again = Analytics.qAggHllIntersect(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_seq_transitions: probabilities sum to 1 per source type") {
    val rows = Analytics.qSeqTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, ts) =>
      val psum = ts.map(_._4).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$src rows sum to $psum")
    }
  }
}

package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Quality

/** Round-15 quality wave: NDCG ranking eval, calibration bins, df
  * vocabulary pruning, boilerplate shingles, grid-bucketed spatial
  * join, compaction planning, degree histogram. The DuckDB oracle
  * hash-compares all seven per driver run; these specs assert the
  * semantic identities the hash can't express (metric bounds, mass
  * conservation, brute-force join equality, discount-table exactness)
  * plus the plan shape of the spatial join.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("ndcg discount table matches round-6 of 1/log2(i+1)") {
    // the literals both engines consume come from ONE computation; pin
    // a couple against independently-written closed forms
    assert(Quality.ndcgDisc(0) == "1.000000")   // 1/log2(2)
    assert(Quality.ndcgDisc(2) == "0.500000")   // 1/log2(4)
    assert(Quality.ndcgDisc(9) == "0.289065")   // 1/log2(11)
  }

  test("q_eval_ndcg: ndcg in (0, 1]; idcg >= dcg; idcg is the max") {
    val rows = SparkEntry.queries("q_eval_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg10")
      val idcg = r.getAs[Double]("idcg10")
      val ndcg = r.getAs[Double]("ndcg10")
      assert(idcg > 0 && dcg >= 0 && dcg <= idcg + 1e-9)
      assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
    }
  }

  test("q_eval_calibration: bins partition the corpus; the md5 score " +
       "is calibrated by construction (|gap| small in every full bin)") {
    val rows = SparkEntry.queries("q_eval_calibration")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSet == (0L to 9L).toSet)
    val n = rows.map(_.getAs[Long]("n")).sum
    val docs = Tables.documents(spark, sf).count()
    assert(n == docs)
    rows.foreach { r =>
      // calibrated generator: per-bin gap is binomial noise around 0;
      // 0.25 is ~5 sigma at the sf0.001 bin sizes (~10 docs/bin)
      assert(r.getAs[Double]("gap") < 0.25,
        s"bin ${r.getAs[Long]("bin")} gap ${r.getAs[Double]("gap")}")
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
  }

  test("q_text_docfreq_prune: kept vocabulary is a subset; token mass " +
       "conserved; the df band actually prunes both tails") {
    val rows = SparkEntry.queries("q_text_docfreq_prune")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vocab_kept") <= r.getAs[Long]("vocab_seen"))
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("n_tokens"))
    }
    // across the corpus something must be dropped (max_df kills the
    // head of this small-vocab synthetic corpus) and something kept
    assert(rows.map(_.getAs[Long]("n_tokens_kept")).sum <
      rows.map(_.getAs[Long]("n_tokens")).sum)
  }

  test("q_text_boilerplate: planted near-duplicates make boilerplate " +
       "non-empty; ratio = n_boiler / n_shingles exactly") {
    val rows = SparkEntry.queries("q_text_boilerplate")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_boiler")).sum > 0,
      "planted doc_id%10 near-dups should repeat 5-gram shingles")
    rows.foreach { r =>
      val expect = BigDecimal(r.getAs[Long]("n_boiler").toDouble /
          r.getAs[Long]("n_shingles").toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("boiler_ratio") == expect)
    }
  }

  test("shingles(): step-1 5-grams, empty below width") {
    assert(Quality.shingles("a b c d").isEmpty)
    assert(Quality.shingles("a b c d e").toSeq == Seq("a b c d e"))
    assert(Quality.shingles("a b c d e f").toSeq ==
      Seq("a b c d e", "b c d e f"))
    assert(Quality.shingles("a  b c d e").toSeq == Seq("a b c d e"))
  }

  test("q_join_spatial_grid: equals the brute-force all-pairs join at " +
       "fixture scale (grid bucketing loses and invents nothing)") {
    import org.apache.spark.sql.functions._
    val grid = SparkEntry.queries("q_join_spatial_grid")(spark, sf).collect()
    val h = md5(col("event_id").cast("string"))
    val pts = Tables.events(spark, sf)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        conv(substring(h, 1, 4), 16, 10).cast("long").as("x"),
        conv(substring(h, 5, 4), 16, 10).cast("long").as("y"))
    val a = pts.where(col("event_type") === "click")
      .select(col("x").as("ax"), col("y").as("ay"))
    val b = pts.where(col("event_type") === "view")
      .select(col("x").as("bx"), col("y").as("by"))
    val brute = a.crossJoin(b)
      .withColumn("d2", (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")))
      .where(col("d2") <= 250000L)
      .groupBy(expr("d2 * 10 DIV 250000").as("bin"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("d2")).as("sum_d2"))
      .collect().map(r => (r.getAs[Long]("bin"),
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("sum_d2")))).toMap
    assert(grid.nonEmpty)
    assert(grid.length == brute.size)
    grid.foreach { r =>
      val (n, s) = brute(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_pairs") == n && r.getAs[Long]("sum_d2") == s)
    }
  }

  test("q_join_spatial_grid: plans as an equi-join on the cell key, " +
       "not a cartesian") {
    val p = plan("q_join_spatial_grid")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q_maintain_compaction_plan: bins conserve bytes and files; " +
       "every non-final bin is full (first-fit rule)") {
    val rows = SparkEntry.queries("q_maintain_compaction_plan")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
    import org.apache.spark.sql.functions._
    val expect = docs.agg(sum(col("n_chars")), count(lit(1))).head()
    assert(rows.map(_.getAs[Long]("bytes")).sum == expect.getLong(0))
    assert(rows.map(_.getAs[Long]("n_files")).sum == expect.getLong(1))
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      // bins are consecutive from 0 and key ranges are disjoint+ordered
      assert(sorted.map(_.getAs[Long]("bin")).toSeq ==
        sorted.indices.map(_.toLong))
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0).getAs[Long]("max_key") < w(1).getAs[Long]("min_key"))
      }
    }
  }

  test("q_eval_avg_precision: AP in (0,1]; a perfect ranking of the " +
       "same labels would give AP = 1 (sanity bound vs prevalence)") {
    val r = SparkEntry.queries("q_eval_avg_precision")(spark, sf).head()
    val ap = r.getAs[Double]("avg_precision")
    val prevalence = r.getAs[Long]("n_pos").toDouble /
      r.getAs[Long]("n_users").toDouble
    assert(ap > 0 && ap <= 1.0)
    // a value-ranked list must beat the random baseline (= prevalence)
    assert(ap > prevalence,
      s"AP $ap should exceed the random baseline $prevalence")
  }

  test("q_eval_lang_f1: confusion counts reconcile with langid's " +
       "per-doc output; F1 is the harmonic identity") {
    val rows = SparkEntry.queries("q_eval_lang_f1")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum
      == docs, "tp+fn over classes must cover every document")
    rows.foreach { r =>
      val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"))
      if (2 * tp + fp + fn > 0) {
        val expect = BigDecimal(2.0 * tp / (2.0 * tp + fp + fn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("f1") == expect)
      }
    }
  }

  test("q_stats_mad: med/mad sit on the exact .5 grid; a constant " +
       "series would null the z (mad=0 guard); outliers flagged at 3.5") {
    val rows = SparkEntry.queries("q_stats_mad")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val med = r.getAs[Double]("med")
      val mad = r.getAs[Double]("mad")
      assert(med * 2 == math.rint(med * 2), s"median $med not on .5 grid")
      assert(mad * 2 == math.rint(mad * 2), s"mad $mad not on .5 grid")
      val z = Option(r.getAs[java.lang.Double]("robust_z"))
      assert(r.getAs[Boolean]("outlier") ==
        z.exists(v => math.abs(v) > 3.5))
    }
  }

  test("q_sample_dedup_weight: effective mass <= raw mass; every " +
       "cluster contributes ~1 effective doc; singletons weigh 1") {
    val rows = SparkEntry.queries("q_sample_dedup_weight")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("eff_docs") <= r.getAs[Long]("n_docs") + 1e-9)
      assert(r.getAs[Double]("eff_chars") <=
        r.getAs[Long]("n_chars_total") + 1e-6)
      // singletons weigh exactly 1, so eff_docs >= n_docs - n_dup_docs
      assert(r.getAs[Double]("eff_docs") >=
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_dup_docs") - 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_dup_docs")).sum > 0,
      "planted near-dups should put some docs in clusters")
  }

  test("q_dq_uniqueness: the true key audits as unique, the non-keys " +
       "do not; dup_rows reconciles") {
    val rows = SparkEntry.queries("q_dq_uniqueness")(spark, sf).collect()
    val byName = rows.map(r => r.getAs[String]("candidate") -> r).toMap
    assert(byName("o_orderkey").getAs[Boolean]("is_key"))
    assert(!byName("o_orderdate").getAs[Boolean]("is_key"))
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_rows") ==
        r.getAs[Long]("n_rows") - r.getAs[Long]("n_distinct"))
    }
  }

  test("q_join_null_safe: null keys match each other (cross of the " +
       "null stripes) and the plan is a hash join, not a nested loop") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_join_null_safe")(spark, "/root/testdata/sf0.01")
      .collect()
    val byNull = rows.map(r => r.getAs[Boolean]("null_key") -> r).toMap
    assert(byNull.contains(false))
    byNull.get(true).foreach { r =>
      // null-null is a cross of the two null stripes
      val ev = Tables.events(spark, "/root/testdata/sf0.01")
      val nc = ev.where(col("event_type") === "click" &&
        col("user_id") % 97 === 0).count()
      val nv = ev.where(col("event_type") === "view" &&
        col("user_id") % 97 === 0).count()
      assert(r.getAs[Long]("n_pairs") == nc * nv)
    }
    val p = SparkEntry.queries("q_join_null_safe")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the <=> branch must stay a HASH join; the only nested-loop shape
    // allowed is the 1-row × 1-row scalar cross of the analytic
    // null-stripe aggregates (PlanSpec allowlists it globally)
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(25).mkString("\n"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "null-safe equality should plan as a hash/merge join:\n" +
        p.linesIterator.take(25).mkString("\n"))
  }

  test("q_time_wow_change: wow is the exact quotient; decline streaks " +
       "count consecutive drops and reset") {
    val rows = SparkEntry.queries("q_time_wow_change")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("wk").getTime)
      var streak = 0L
      sorted.foreach { r =>
        val prev = Option(r.getAs[java.lang.Long]("prev"))
        val declined = prev.exists(p => r.getAs[Long]("n") < p)
        streak = if (declined) streak + 1 else 0
        assert(r.getAs[Long]("decline_streak") == streak,
          s"streak mismatch at ${r.getAs[java.sql.Timestamp]("wk")}")
        prev.foreach { p =>
          val expect = BigDecimal((r.getAs[Long]("n") - p).toDouble / p)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(r.getAs[Double]("wow") == expect)
        }
      }
    }
  }

  test("q_agg_grouping_id: each grouping set's n sums to the corpus; " +
       "gid distinguishes superaggregate rows from real keys") {
    val rows = SparkEntry.queries("q_agg_grouping_id")(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 3L))
    byGid.values.foreach { g =>
      assert(g.map(_.getAs[Long]("n")).sum == total)
    }
    // gid bit semantics: 1 = linestatus aggregated, 3 = both
    byGid(1L).foreach { r =>
      assert(r.getAs[Byte]("g_rf") == 0 && r.getAs[Byte]("g_ls") == 1)
      assert(r.isNullAt(r.fieldIndex("l_linestatus")))
    }
    assert(byGid(3L).length == 1)
  }

  test("q_win_nth_value: milestones agree with a per-customer sort of " +
       "the raw orders") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_win_nth_value")(spark, sf).collect()
    val raw = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.take(50).foreach { r =>
      val sorted = raw(r.getAs[Long]("o_custkey")).sortBy(o =>
        (o.getAs[Any]("o_orderdate").toString,
          o.getAs[Long]("o_orderkey")))
      assert(r.getAs[Long]("first_order") ==
        sorted.head.getAs[Long]("o_orderkey"))
      if (sorted.length >= 2)
        assert(r.getAs[Long]("second_order") ==
          sorted(1).getAs[Long]("o_orderkey"))
      else assert(r.isNullAt(r.fieldIndex("second_order")))
    }
  }

  test("q_time_rfm: quintile scores are 1..5, balanced within ±1 " +
       "bucket-size; the best segment's users beat the worst's on " +
       "raw frequency") {
    val rows = SparkEntry.queries("q_time_rfm")(spark, sf).collect()
    assert(rows.nonEmpty)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val byScore = rows.groupBy(_.getAs[Int](c)).view.mapValues(_.length)
      assert(byScore.keySet.subsetOf(Set(1, 2, 3, 4, 5)))
      assert(byScore.values.max - byScore.values.min <= 1,
        s"$c buckets unbalanced: $byScore")
    }
    val f5 = rows.filter(_.getAs[Int]("f_score") == 5)
      .map(_.getAs[Long]("f"))
    val f1 = rows.filter(_.getAs[Int]("f_score") == 1)
      .map(_.getAs[Long]("f"))
    assert(f5.min >= f1.max)
    // direction holds on every axis: score 5 = most recent (FEWEST
    // days since last event), most frequent, highest value — the r15
    // ADVICE item was an inverted r_score passing through a mirrored
    // oracle, so each axis now gets its own best-beats-worst check
    val r5 = rows.filter(_.getAs[Int]("r_score") == 5)
      .map(_.getAs[Int]("r_days"))
    val r1 = rows.filter(_.getAs[Int]("r_score") == 1)
      .map(_.getAs[Int]("r_days"))
    assert(r5.max <= r1.min, s"r_score inverted: best=${r5.max} worst=${r1.min}")
    val m5 = rows.filter(_.getAs[Int]("m_score") == 5)
      .map(_.getAs[Double]("m"))
    val m1 = rows.filter(_.getAs[Int]("m_score") == 1)
      .map(_.getAs[Double]("m"))
    assert(m5.min >= m1.max, s"m_score inverted: best=${m5.min} worst=${m1.max}")
  }

  test("q_graph_degree_hist: node count equals the co-purchase graph's " +
       "vertex count; degree mass equals 2x edges") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_graph_degree_hist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.alias("a").join(li.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p"), col("b.p")).count()
      .where(col("count") >= 2)
    val nEdges = edges.count()
    assert(rows.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes"))
      .sum == 2 * nEdges)
  }
}

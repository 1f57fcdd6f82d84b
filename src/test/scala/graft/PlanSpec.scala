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

  /** Run `body` with every size-based broadcast disabled, restoring the
    * previous thresholds afterwards — any BroadcastExchange that
    * survives is an explicit hint.
    */
  private def withBroadcastOff[A](body: => A): A = {
    val thresholds = Seq("spark.sql.autoBroadcastJoinThreshold",
                         "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = thresholds.map(k => k -> spark.conf.getOption(k))
    try {
      thresholds.foreach(spark.conf.set(_, "-1"))
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_join_bucketed: co-partitioned sort-merge join plans NO exchange") {
    val (o, l) = graft.queries.Relational.bucketedFacts(spark, sf)
    withBroadcastOff {
      val joined = o.join(l, org.apache.spark.sql.functions.col("o_orderkey") ===
                             org.apache.spark.sql.functions.col("l_orderkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"),
             "bucketed fact-fact join must be a sort-merge join")
      assert(!p.contains("Exchange"),
             "both sides are bucketed on the join key — any Exchange " +
             s"means the at-rest co-partitioning was not used:\n$p")
    }
  }

  test("q_sample_balance: per-language counts broadcast, corpus never shuffles") {
    val p = plan("q_sample_balance")
    assert(p.contains("BroadcastHashJoin"),
           s"the 5-row count table must broadcast:\n$p")
    // the only acceptable exchanges: the counts aggregation (tiny) and
    // the final presentation sort — never a hash repartition of docs
    assert(!"hashpartitioning\\(doc_id".r.findFirstIn(p).isDefined,
           s"corpus rows must not shuffle on doc_id for a filter:\n$p")
  }

  test("q_merge_upsert: one key shuffle feeds the latest-wins window") {
    val p = plan("q_merge_upsert")
    val n = "hashpartitioning\\(o_orderkey".r.findAllIn(p).size
    assert(n <= 1,
           s"union + window must shuffle the merge key at most once:\n$p")
  }

  test("bucket count sizing: 128 MB target, power of two, floored and capped") {
    import graft.queries.Relational.bucketCountForBytes
    val mb = 1024L * 1024
    assert(bucketCountForBytes(0L) == 8)               // tiny input → floor
    assert(bucketCountForBytes(500 * mb) == 8)         // 4 needed → floor 8
    assert(bucketCountForBytes(2048 * mb) == 16)       // exact power of two
    assert(bucketCountForBytes(2049 * mb) == 32)       // rounds UP, stays pow2
    assert(bucketCountForBytes(100L * 1024 * 1024 * mb) == (1 << 20)) // 100 TB cap
  }

  test("q_sim_knn_join_ivf: only the hinted constant-size centroid broadcasts") {
    val p = plan("q_sim_knn_join_ivf")
    assert(p.contains("partial_topkbyscore"),
           "per-probe top-k must partial-aggregate map-side")
    withBroadcastOff {
      val df = SparkEntry.queries("q_sim_knn_join_ivf")(spark, sf)
      val p2 = plan(df)
      // tree form only ("BroadcastExchange (6)") — the formatted detail
      // section repeats each node as "(6) BroadcastExchange"
      val n = "BroadcastExchange \\(\\d+\\)".r.findAllIn(p2).size
      assert(n <= 2,
             "with size-based broadcasting off, only the two hinted " +
             s"nlist-row centroid-table broadcasts may remain, got $n:\n$p2")
      assert(!p2.contains("CartesianProduct"))
    }
  }

  test("q_join_skew: salt explode on the build side, equi-join includes the salt") {
    withBroadcastOff {
      val df = SparkEntry.queries("q_join_skew")(spark, sf)
      val p = plan(df)
      assert(p.contains("explode"),
             "build side must fan out over the salt range")
      assert(p.contains("__salt"),
             "join keys must include the salt sub-key")
      assert(!p.contains("BroadcastExchange"),
             "the salted build side must not broadcast with the threshold off")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q_dedup_lsh_verify: band-bucket equi-joins, no broadcast of corpus data") {
    withBroadcastOff {
      // the registered key returns the memoized chain artifact (a bare
      // checkpoint scan) — assert the REAL build plan
      val (df, deps) = graft.queries.LlmOps.lshVerifiedPairsPlan(spark, sf)
      val p = plan(df)
      deps.foreach(_.unpersist())
      assert(p.contains("ShuffledHashJoin"),
             "candidate generation and gram intersection hash-join on " +
             "wide keys — sorting them is pure overhead")
      assert(!p.contains("BroadcastExchange"),
             "nothing in the chained LSH→verify pipeline may broadcast " +
             "table-derived data")
      assert(!p.contains("CartesianProduct") &&
             !p.contains("BroadcastNestedLoopJoin"),
             "the n² pair space must never be planned")
    }
  }

  test("q_dedup_embed: chunk-bucket equi-join candidates, no cartesian, " +
       "canary adds no corpus pass") {
    val (df, deps) = graft.queries.LlmOps.dedupEmbedPlan(spark, sf)
    val p = plan(df)
    deps.foreach(_.unpersist())
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
           "the n² vector pair space must never be planned")
    assert(p.contains("chunk_val"), "candidates must bucket on chunk value")
    // the sentinel canary is a 2-row local Range union — it must not add
    // a TakeOrdered/Sort over the embeddings table (the earlier min-id
    // canary design did exactly that)
    assert(!p.contains("TakeOrderedAndProject"),
           "canary must not scan the corpus for a representative vector")
  }

  test("q_dedup_embed_stats: pair space is an equi-join on the block id") {
    val df = SparkEntry.queries("q_dedup_embed_stats")(spark, sf)
    val p = plan(df)
    assert(p.contains("blk"), "join keys must include the block id")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
           "sampled all-pairs must never plan a cartesian")
  }

  test("q_join_bloom: might_contain prunes the probe below its exchange") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.classic.GraftShim
    val p = plan("q_join_bloom")
    assert(p.contains("might_contain"),
           "the probe-side filter must carry the bloom membership test")
    // the filter must sit BELOW the probe's exchange: in the formatted
    // plan the Filter node containing might_contain references the
    // lineitem scan subtree, and no Exchange appears between them
    val filterIdx = p.indexOf("might_contain")
    val scanIdx = p.indexOf("lineitem")
    assert(scanIdx >= 0 && filterIdx >= 0,
           "expected a lineitem scan and a bloom filter in the plan")
    // and it actually prunes: bloom-filtered probe row count is a strict
    // subset of the full probe (build side is ~10% of orders)
    val orders = Tables.orders(spark, sf).where(col("o_totalprice") > 450000)
    val bloomAgg = GraftShim.column(
      new BloomFilterAggregate(
        GraftShim.expression(xxhash64(col("o_orderkey"))),
        Literal(1000000L), Literal(8L * 1024 * 1024 * 8)).toAggregateExpression())
    val bf = orders.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val might = GraftShim.column(BloomFilterMightContain(
      Literal.create(bf, org.apache.spark.sql.types.BinaryType),
      GraftShim.expression(xxhash64(col("l_orderkey")))))
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val kept = li.where(might).count()
    val trueMatch = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(kept < total / 2,
           s"bloom should prune most of the probe ($kept of $total kept)")
    assert(kept >= trueMatch,
           "bloom may only over-approximate, never drop a true match")
  }

  test("q_sessionize: one user_id shuffle feeds windows and the session agg") {
    val p = plan("q_sessionize")
    // HashPartitioning(user_id) satisfies the (user_id, session_no)
    // clustering requirement of the final aggregate, so lag, running
    // sum AND the session agg ride one hash exchange; the only other is
    // the range partitioning of the output ORDER BY. Count detail-
    // section nodes — the formatted plan prints each node twice.
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 2,
           s"expected 1 window shuffle + 1 order-by exchange, plan has $exchanges")
  }

  test("q_text_topk_ngrams: global top-k is TakeOrdered over a partial agg") {
    val p = plan("q_text_topk_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
           "top-k must never globally sort the gram table")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
           "gram counts must partial-aggregate map-side")
  }

  test("q_join_range_banded: the range predicate IS the equi-join key") {
    val p = plan("q_join_range_banded")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("BroadcastHashJoin"),
           "banded form must plan a hash/merge equi-join")
    // the between must NOT survive as a join residual — banding absorbed
    // it into the keys; the only remaining non-key predicate is k1 < k2
    assert(!p.contains(">= (s1"), "no residual range condition expected")
  }

  test("q_text_contamination: benchmark gram set broadcasts, corpus side never shuffles") {
    val p = plan("q_text_contamination")
    assert(p.contains("BroadcastHashJoin"),
           s"the MB-scale benchmark grams must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
           s"the corpus gram stream must probe the broadcast, not sort-merge:\n$p")
  }

  test("q_sim_pq_adc: ADC scan is shuffle-free, rerank join broadcasts, top-k operator") {
    val p = plan("q_sim_pq_adc")
    assert(p.contains("TakeOrderedAndProject"),
           s"both top-k stages must be TakeOrderedAndProject:\n$p")
    assert(p.contains("BroadcastHashJoin"),
           s"the 50-row candidate set must broadcast into the rerank join:\n$p")
    assert(hashExchanges(p) == 0,
           s"nothing in ADC+rerank may shuffle corpus data:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  // formatted mode prints the Exchange node and its partitioning argument
  // on separate lines — count the argument spelling, which distinguishes
  // hash (joins/windows/aggs) from range (the final ORDER BY)
  private def hashExchanges(p: String): Int =
    "hashpartitioning\\(".r.findAllIn(p).size

  test("q_join_dpp: dynamic-pruning subquery lands in the fact scan's partition filters") {
    val p = plan("q_join_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"),
           s"the dim filter must prune the partitioned fact scan at runtime:\n$p")
    assert(p.contains("BroadcastHashJoin"),
           s"the 5-row dim must broadcast:\n$p")
  }

  test("chunking and run-dedup are pure map stages: no shuffle before the final sort") {
    for (name <- Seq("q_text_chunk", "q_text_dedup_runs")) {
      val p = plan(name)
      assert(hashExchanges(p) == 0,
             s"$name must not hash-shuffle — it is row-local by design:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
             s"$name must not join:\n$p")
    }
  }

  test("sequence packing rides exactly one source exchange") {
    val p = plan("q_text_pack")
    assert(hashExchanges(p) == 1,
           s"the running-sum window must be the only hash exchange:\n$p")
  }

  test("interpolation windows share one user_id exchange") {
    val p = plan("q_win_interpolate")
    assert(hashExchanges(p) == 1,
           s"all four IGNORE-NULLS windows must share one exchange:\n$p")
  }

  test("sequence matching rides one user exchange; the regex work is post-agg row-local") {
    val p = plan("q_seq_pattern")
    assert(hashExchanges(p) == 1,
           s"the ordered string build must be the only hash exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
           s"no join belongs in this plan:\n$p")
  }

  test("interval sweep aggregates deltas before the date-axis window") {
    val p = plan("q_interval_sweep")
    // one exchange for the per-date aggregate; the running-sum window
    // runs over the bounded date dimension (single partition by design,
    // documented in the scaladoc) — ensure no join crept in
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
           s"the sweep must not join:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
           s"running sum missing:\n$p")
  }

  test("q_agg_bitmap_distinct: bitmap partials combine map-side before one shuffle") {
    val p = plan("q_agg_bitmap_distinct")
    assert(p.contains("partial_bitmap_construct_agg"),
           s"bitmap build must be a map-side partial aggregate:\n$p")
    assert(p.contains("partial_sum(static_invoke(BitmapExpressionUtils.bitmapCount"),
           s"popcount sum must also combine map-side:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_partkey") && !read.contains("l_extendedprice"),
           s"scan must read only key + group columns, got: $read")
  }

  test("q_dq_outliers: three mergeable passes, row table never shuffles") {
    val p = plan("q_dq_outliers")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
           "median and (median, MAD) stats must broadcast back, not shuffle rows")
    assert(!p.contains("SortMergeJoin"),
           "the row table must never shuffle into a join")
    assert(p.contains("partial_percentile"),
           "exact percentile must run as a partial-mergeable aggregate")
    // the only Exchanges are the tiny per-group stats and the final sort
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_extendedprice") && !read.contains("l_quantity"),
           s"scan must prune to the screened column, got: $read")
  }

  test("q_dedup_url: map-only canonicalization, one shuffle on the canonical key") {
    val p = plan("q_dedup_url")
    assert(!p.contains("Join"), s"canonicalize+dedup must not join:\n$p")
    assert(p.contains("partial_count") && p.contains("partial_min"),
           "dedup aggregate must combine map-side")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("struct<doc_id:bigint>"),
           s"scan must read doc_id only, got: $read")
  }

  test("q_join_null_anti: NOT IN plans as broadcast anti join, not a nested loop") {
    val p = plan("q_join_null_anti")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
           s"null-aware NOT IN must be a broadcast LeftAnti hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"nested-loop shapes must not appear:\n$p")
  }

  test("q_graph_pagerank: aggregated graph is persisted once, reused per iteration") {
    val (df, deps) = graft.queries.Analytics.graphPagerankPlan(spark, sf)
    val p = plan(df)
    deps.foreach(_.unpersist())
    assert(p.contains("InMemoryTableScan"),
           "edge table must come from the persisted InMemoryRelation, " +
             "not a rebuilt lineage per iteration")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sample_reservoir: partial WindowGroupLimit keeps k per group before the shuffle") {
    val p = plan("q_sample_reservoir")
    val idxPartialLimit = p.indexOf("WindowGroupLimit")
    val idxExchange = p.indexOf("Exchange")
    assert(idxPartialLimit >= 0 && idxPartialLimit > idxExchange,
           s"rank filter must push down as WindowGroupLimit:\n${p.take(800)}")
    assert(p.contains("row_number(), 20, Partial"),
           s"the map-side limit must be the Partial mode:\n${p.take(1200)}")
  }

  test("q_agg_hll_merge: sketches build and union as partial aggregates") {
    val p = plan("q_agg_hll_merge")
    assert(p.contains("partial_hll_sketch_agg"),
           "per-(group, month) sketches must combine map-side")
    assert(p.contains("partial_hll_union_agg"),
           "the cross-month union must also combine map-side")
  }

  test("q_sample_weighted: pure TakeOrderedAndProject, no global sort, no exchange") {
    val p = plan("q_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
           "weighted A-ES top-k must be per-partition heap + driver merge")
    assert(!p.contains("Exchange"),
           "scan -> project -> top-k needs no shuffle at all")
  }

  test("q_cluster_kmeans: centroid joins broadcast, assignment never sort-merges") {
    val p = plan("q_cluster_kmeans")
    assert(!p.contains("SortMergeJoin"),
           "k*d centroid tables are model constants — every join must broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
           "both Lloyd iterations must broadcast their centroid table")
  }

  test("q_join_setsim: candidate generation is an equi-join on the gram key") {
    val (df, deps) = graft.queries.Curation.joinSetsimPlan(spark, sf)
    val p = plan(df)
    deps.foreach(_.unpersist())
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
           "prefix filtering must keep pair generation an equi-join")
    // the rarest-first ranking rides the per-doc window
    assert(p.contains("Window"), "per-doc prefix ranking must be a window")
  }

  test("q_text_dedup_substrings: window df and doc rollup are the only shuffles") {
    val p = plan("q_text_dedup_substrings")
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
           "gram-frequency join must not add a third shuffle path at test scale")
    assert(!p.contains("CartesianProduct"))
    // both aggregations must combine map-side (partial HashAggregate)
    assert("partial_count".r.findAllIn(p).size >= 2,
           "df count and per-doc rollup must both have map-side partials")
  }

  test("q_agg_heavy_hitters: sketches build as partial aggregates, exact side is TakeOrdered") {
    val p = plan("q_agg_heavy_hitters")
    assert(p.contains("partial_approx_top_k_accumulate"),
           "per-language sketches must fold map-side — only sketches cross the wire")
    assert(p.contains("TakeOrderedAndProject"),
           "the exact top-20 must be a distributed top-k, not a global sort")
  }

  test("q_sample_stratified: per-stratum k filter plans the partial WindowGroupLimit") {
    val p = plan("q_sample_stratified")
    val idxPartialLimit = p.indexOf("WindowGroupLimit")
    val idxExchange = p.indexOf("Exchange")
    assert(idxPartialLimit >= 0 && idxPartialLimit > idxExchange,
           s"rn <= 20 must push down as WindowGroupLimit:\n${p.take(800)}")
    assert(p.contains("row_number(), 20, Partial"),
           s"the map-side limit must be the Partial mode:\n${p.take(1200)}")
  }

  test("q_text_winnowing: per-doc windows share one doc-keyed exchange") {
    val p = plan("q_text_winnowing")
    // the gram count, window min, and anchor filter all partition by
    // doc_id — one exchange serves every window
    // formatted mode prints the partitioning argument on its own line —
    // count the argument spelling, not "Exchange hashpartitioning(..."
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size == 1,
           s"winnowing must shuffle the gram table exactly once:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_attribution_positional: user-keyed equi-join, one purchase exchange for both windows") {
    val p = plan("q_attribution_positional")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
           "the 24h window must ride the user equi-join as a residual")
    assert("hashpartitioning\\(pid".r.findAllIn(p).size == 1,
           s"rank + count windows and the rollup share one purchase exchange:\n${p.take(1200)}")
  }

  test("q_text_cdc_chunk: only reduced streams shuffle — never the full gram table") {
    val p = plan("q_text_cdc_chunk")
    // Two doc_id exchanges by design, BOTH carrying reduced streams:
    // the gram-total branch shuffles combiner-collapsed partial counts
    // (≤1 row per doc per partition), the boundary branch shuffles only
    // the ~1/16 of grams that pass the boundary filter. The old
    // single-exchange form shuffled AND window-sorted every gram —
    // measured ×18.6 on 10× data at sf1 (SCALE.md); this shape is ×1.7.
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size == 2,
           s"expected the two reduced-stream exchanges:\n${p.take(1200)}")
    assert(p.contains("partial_count"),
           "the gram-total branch must combine map-side before its exchange")
    assert("Filter.*startswith|startswith.*Filter".r.findFirstIn(
             p.replaceAll("\n", " ")).isDefined ||
           p.contains("Filter"),
           "the window branch must filter to boundary rows below its exchange")
  }

  test("q_dedup_semantic: centroids and leader vectors broadcast, corpus never all-pairs") {
    val p = plan("q_dedup_semantic")
    assert(p.contains("BroadcastExchange"),
           "the constant-size centroid/leader sides must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("no CartesianProduct anywhere; nested-loop joins only for constant-size sides") {
    // documented tiny-side broadcast crossJoins (constant-size builds:
    // a single query vector, the 16-row centroid table, a 1-row count)
    // compile to BroadcastNestedLoopJoin — allowed there and only there
    val bnljAllowed = Set("q_sim_topk", "q_sim_ann_ivf", "q_sim_knn_join_ivf",
                          "q_text_tfidf", "q_text_perplexity", "q_text_pmi",
                          // 1-row global min/max stats broadcast
                          "q_dq_drift",
                          // 1-row totals broadcast (chi² grand total, KS
                          // sample sizes, mixture token total, freshness
                          // high-water mark)
                          "q_stats_chisq", "q_stats_ks", "q_select_mixture",
                          "q_dq_freshness",
                          // 1-row digit-census total broadcast
                          "q_dq_benford",
                          // 1-row child/orphan count pairs per relation
                          "q_dq_orphans",
                          // 1-row distinct-order total broadcast
                          "q_basket_lift",
                          // 10-row query-vector batch broadcast
                          "q_sim_batch_topk",
                          // 1-row key-stats × 1-row gap-stats combine
                          "q_dq_pk_gaps",
                          // 1-row corpus-total broadcast
                          "q_dq_entropy",
                          // 1-row query-vector + ground-truth broadcast
                          "q_embed_ann_recall",
                          // non-equi pair joins over the AGGREGATED
                          // day series (≤ |days|² comparisons by
                          // contract, never the fact table)
                          "q_stats_theilsen", "q_stats_kendall",
                          // 1-row value-range + ≤50-row marginals
                          "q_stats_mi",
                          // 1-row overall-sign broadcast
                          "q_stats_simpson",
                          // 1-row (n_docs, avgdl) stats broadcast
                          "q_text_bm25",
                          // ≤20-row shared-rank list × 20-depth series
                          "q_rank_rbo",
                          // 1-row cutoff-timestamp broadcast
                          "q_split_temporal",
                          // 1-row residual-sd broadcast
                          "q_time_stl",
                          // 1-row p05-threshold broadcast
                          "q_embed_outliers",
                          // 1-row null-stripe count × 1-row count combine
                          "q_join_null_safe")
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

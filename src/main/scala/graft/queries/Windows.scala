package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import util._

/** Window functions (SURVEY.md §2.3 — reference analog: ordered
  * `actions.seq` per kyoku, scrape.py:118,578).
  *
  * Scale note: all windows here partition by a high-cardinality key
  * (custkey / user_id / orderkey), so the single shuffle they cost
  * distributes evenly; none require a global ordering over all rows.
  * Window order keys always include a unique tiebreaker so results are
  * deterministic under any partitioning.
  */
object Windows {

  /** row_number / rank / dense_rank. rank windows order by a tie-prone
    * key (order year) to exercise real tie semantics — ties rank equal in
    * any engine; row_number gets a unique key order.
    */
  val qWinRank: Q = (s, d) => {
    val wUnique = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wTies = Window.partitionBy("o_custkey")
      .orderBy(year(col("o_orderdate")).asc)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(wUnique).as("rn"),
      rank().over(wTies).as("rk"),
      dense_rank().over(wTies).as("drk")
    ).orderBy("o_custkey", "o_orderkey")
  }

  val qWinRankSql: String =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
      |  rank() OVER (PARTITION BY o_custkey
      |               ORDER BY EXTRACT(year FROM o_orderdate) ASC) AS rk,
      |  dense_rank() OVER (PARTITION BY o_custkey
      |                     ORDER BY EXTRACT(year FROM o_orderdate) ASC) AS drk
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Running sum + moving average over an ordered per-user frame (score
    * progression pattern). Sums go through exact decimals; the moving avg
    * is an IEEE division of identical operands in both engines.
    */
  val qWinRunning: Q = (s, d) => {
    val base = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = base.rowsBetween(-2, Window.currentRow)
    val dec = DecimalType(18, 2)
    Tables.events(s, d).select(
      col("event_id"),
      sum(col("value").cast(dec)).over(run).cast("double").as("run_sum"),
      (sum(col("value").cast(dec)).over(mov).cast("double") /
        count(lit(1)).over(mov)).as("mov_avg")
    ).orderBy("event_id")
  }

  val qWinRunningSql: String =
    """SELECT event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  / COUNT(*) OVER
      |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
      |FROM events ORDER BY event_id""".stripMargin

  /** lag / lead (previous action / next discard pattern). Raw source
    * doubles pass through untouched — bit-identical in both engines.
    */
  val qWinLagLead: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d).select(
      col("event_id"),
      lag(col("value"), 1).over(w).as("prev_val"),
      lead(col("value"), 1).over(w).as("next_val"),
      lag(col("event_type"), 2).over(w).as("prev2_type")
    ).orderBy("event_id")
  }

  val qWinLagLeadSql: String =
    """SELECT event_id,
      |  lag(value, 1) OVER w AS prev_val,
      |  lead(value, 1) OVER w AS next_val,
      |  lag(event_type, 2) OVER w AS prev2_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY event_id""".stripMargin

  /** RANGE (value-based) frame: neighbors within ±1 of l_linenumber. */
  val qWinRangeFrame: Q = (s, d) => {
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber").asc)
      .rangeBetween(-1, 1)
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      sum(col("l_quantity").cast(DecimalType(18, 2))).over(w)
        .cast("double").as("neighborhood_qty"),
      count(lit(1)).over(w).as("neighborhood_n")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  val qWinRangeFrameSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS neighborhood_qty,
      |  COUNT(*) OVER w AS neighborhood_n
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
      |             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Top-k per group via rank filter (player-ranking pattern). At scale
    * this beats a global sort: one hash shuffle on the group key, then a
    * bounded per-group heap.
    */
  val qWinTopkGroup: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val qWinTopkGroupSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Distribution-rank family: ntile / percent_rank / cume_dist /
    * first_value / last_value (full-frame).
    */
  val qWinDist: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cdist"),
      first(col("o_orderkey")).over(w).as("first_key"),
      last(col("o_orderkey")).over(full).as("last_key")
    ).orderBy("o_custkey", "o_orderkey")
  }

  val qWinDistSql: String =
    """SELECT o_custkey, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
      |  ROUND(cume_dist() OVER w, 6) AS cdist,
      |  first_value(o_orderkey) OVER w AS first_key,
      |  last_value(o_orderkey) OVER
      |    (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Batch gap-sessionization — the canonical event-log shape for a
    * training-data pipeline (the batch twin of the streaming session
    * window + TTL operators): per user, a session breaks where the
    * event-time gap exceeds 30 min; emit per-session stats under a
    * dense 1-based session number. Plan: ONE shuffle on user_id feeds
    * both window passes (lag → break flags → running sum) and the final
    * per-(user, session) aggregation — Catalyst reuses the partitioning
    * because every step keys on user_id. At 100 TB the partition key is
    * the user (millions of them), so the windows parallelize per user
    * and no state ever spans users. Gap arithmetic runs in exact
    * microseconds (both engines truncate the nanos column to µs), and
    * (ts, event_id) makes the per-user order total.
    */
  val qSessionize: Q = (s, d) => {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
             1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("brk")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("t_start"), max(col("ts")).as("t_end"),
           sum(col("value").cast(dec)).cast("double").as("total_value"))
      .orderBy("user_id", "session_no")
  }

  val qSessionizeSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
      |  FROM events
      |), l AS (
      |  SELECT *, lag(ts) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev_ts
      |  FROM e
      |), f AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
      |                 THEN 1 ELSE 0 END AS brk
      |  FROM l
      |), sn AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM f
      |)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |       COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sn GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** Last-observation-carried-forward (LOCF) gap fill — the standard
    * repair for sparse time series. The fixture treats `error` events'
    * value as missing (both engines apply the same NULLIF), then fills
    * each gap with the latest preceding non-null value in the user's
    * timeline via `last(..., ignoreNulls)` over an unbounded-preceding
    * frame (DuckDB: `last_value(... IGNORE NULLS)`). Leading gaps (no
    * prior observation) stay NULL in both engines.
    *
    * Scale shape: one shuffle on the high-cardinality user_id, linear
    * running state per partition — same cost class as any running sum.
    */
  val qWinLocf: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("v",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .select(
        col("event_id"), col("user_id"),
        col("v").isNull.as("was_gap"),
        round(last(col("v"), ignoreNulls = true).over(w), 6).as("v_filled"))
      .orderBy("user_id", "event_id")
  }

  val qWinLocfSql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events
      |)
      |SELECT event_id, user_id, v IS NULL AS was_gap,
      |  ROUND(last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
      |FROM base ORDER BY user_id, event_id""".stripMargin

  /** Linear interpolation gap fill — the two-sided upgrade of [[qWinLocf]]:
    * a missing observation is reconstructed from its nearest non-null
    * neighbors on BOTH sides, weighted by event-time distance:
    * `v = pv + (nv − pv) · (t − pt)/(nt − pt)`. Same missing-value
    * fixture as LOCF (`error` events). Leading/trailing gaps (only one
    * neighbor exists) stay NULL — carry-forward is LOCF's contract, not
    * interpolation's.
    *
    * Determinism: timestamps enter the formula as exact integer
    * microseconds; both engines evaluate the identical IEEE expression
    * tree on identical operands, and the result rounds to 6 dp.
    *
    * Scale shape: four IGNORE-NULLS windows, all on the same
    * (user_id, ts) partitioning — one exchange, linear per-partition
    * state, same cost class as LOCF.
    */
  val qWinInterpolate: Q = (s, d) => {
    val back = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val df = Tables.events(s, d)
      .withColumn("v",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .withColumn("t", unix_micros(col("ts")))
      .withColumn("obs_t", when(col("v").isNotNull, col("t")))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pt", last(col("obs_t"), ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nt", first(col("obs_t"), ignoreNulls = true).over(fwd))
    df.select(
        col("event_id"), col("user_id"),
        col("v").isNull.as("was_gap"),
        round(
          when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("t") - col("pt")).cast("double") /
               (col("nt") - col("pt")).cast("double"))), 6).as("v_interp"))
      .orderBy("user_id", "event_id")
  }

  val qWinInterpolateSql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS t,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events
      |), nbr AS (
      |  SELECT event_id, user_id, t, v,
      |    last_value(v IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
      |      OVER wb AS pt,
      |    first_value(v IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
      |      OVER wf AS nt
      |  FROM base
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT event_id, user_id, v IS NULL AS was_gap,
      |  ROUND(CASE WHEN v IS NOT NULL THEN v
      |             ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
      |                                    / CAST(nt - pt AS DOUBLE)) END,
      |        6) AS v_interp
      |FROM nbr ORDER BY user_id, event_id""".stripMargin

  /** Cohort retention — the standard growth analytics matrix: users are
    * grouped by their first-active week (the cohort), and each cell
    * (cohort, k) counts how many of them were active k weeks later.
    * Weeks are Monday-truncated in both engines; the offset is exact
    * integer day arithmetic / 7.
    *
    * Scale shape: first-seen is one min-aggregate on user_id; the
    * activity set is one distinct on (user, week); the join back is on
    * user_id (broadcastable — the first-seen table has one row per
    * user, small relative to events). Two keyed exchanges total, no
    * self-join of the fact table.
    */
  val qCohortRetention: Q = (s, d) => {
    val weekly = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = weekly.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    weekly.join(cohorts, "user_id")
      .select(col("cohort_wk"),
              (datediff(col("wk"), col("cohort_wk")) / 7)
                .cast("long").as("week_offset"))
      .groupBy("cohort_wk", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "week_offset")
  }

  val qCohortRetentionSql: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id,
      |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
      |  FROM events
      |), cohorts AS (
      |  SELECT user_id, MIN(wk) AS cohort_wk FROM weekly GROUP BY user_id
      |)
      |SELECT c.cohort_wk,
      |  CAST(datediff('day', c.cohort_wk, w.wk) // 7 AS BIGINT)
      |    AS week_offset,
      |  COUNT(*) AS n_users
      |FROM weekly w JOIN cohorts c USING (user_id)
      |GROUP BY c.cohort_wk, week_offset
      |ORDER BY c.cohort_wk, week_offset""".stripMargin

  /** Sequence-pattern matching (the MATCH_RECOGNIZE shape): each user's
    * time-ordered event types collapse to a character string (c/e/p/s/v
    * — first letters are distinct in this domain) and a regex counts
    * non-overlapping occurrences of click → any views → purchase
    * (`cv*p`). Regex stays in the Java∩RE2 common dialect (no
    * backrefs/lookarounds), so both engines count identically — the
    * same dialect contract as q_text_pii_scrub.
    *
    * Scale shape: the per-user string builds from ONE ordered
    * aggregation (sort-key structs, as in q_agg_listagg — never
    * arrival-order collect_list); per-user event counts are bounded by
    * session activity, not corpus size, and everything after the
    * groupBy is row-local.
    */
  val qSeqPattern: Q = (s, d) => {
    val seq = Tables.events(s, d)
      .select(col("user_id"),
              struct(col("ts"), col("event_id"),
                     substring(col("event_type"), 1, 1).as("ch")).as("ev"))
      .groupBy("user_id")
      .agg(concat_ws("",
             transform(array_sort(collect_list(col("ev"))),
                       e => e.getField("ch"))).as("seq"))
    seq.select(
        col("user_id"),
        length(col("seq")).as("n_events"),
        size(expr("regexp_extract_all(seq, 'cv*p', 0)")).cast("long")
          .as("n_conversions"),
        md5(col("seq")).as("seq_md5"))
      .orderBy("user_id")
  }

  val qSeqPatternSql: String =
    """WITH seqs AS (
      |  SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), ''
      |               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
      |  FROM events GROUP BY user_id
      |)
      |SELECT user_id, CAST(length(seq) AS INTEGER) AS n_events,
      |  CAST(len(regexp_extract_all(seq, 'cv*p')) AS BIGINT)
      |    AS n_conversions,
      |  md5(seq) AS seq_md5
      |FROM seqs ORDER BY user_id""".stripMargin

  /** SCD Type-2 history build — fold a change stream into versioned
    * dimension intervals: consecutive same-attribute events collapse
    * into one version; each version carries `[valid_from, valid_to)`
    * with NULL valid_to marking the current row. This is the
    * change-data-capture → warehouse-dimension transform.
    *
    * Shape: lag to flag changes, running sum to number versions, one
    * aggregate, lead for the interval close — ALL of it rides a single
    * user_id exchange (every window and the groupBy share the key), so
    * at 100 TB this is one shuffle of the change stream.
    */
  val qScd2: Q = (s, d) => {
    val byTs = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val byVersion = Window.partitionBy("user_id").orderBy(col("version").asc)
    Tables.events(s, d)
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTs).isNull ||
             lag(col("event_type"), 1).over(byTs) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("chg")).over(byTs.rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow)))
      .groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "event_type", "valid_from",
              "valid_to", "n_events", "is_current")
      .orderBy("user_id", "version")
  }

  val qScd2Sql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), versioned AS (
      |  SELECT user_id, event_type, ts,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                   ROWS UNBOUNDED PRECEDING) AS version
      |  FROM flagged
      |), agg AS (
      |  SELECT user_id, version, event_type,
      |    MIN(ts) AS valid_from, COUNT(*) AS n_events
      |  FROM versioned GROUP BY user_id, version, event_type
      |)
      |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
      |  valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
      |  n_events,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
      |    AS is_current
      |FROM agg ORDER BY user_id, version""".stripMargin

  /** Ordered funnel analysis — of the users who signed up, how many
    * clicked within 24 h, and of those how many purchased within
    * 24 h of that first click? Each stage requires a STRICTLY LATER
    * event than the previous stage's first completion, inside a
    * 24-hour conversion window (the window is what makes drop-off real
    * on this densely-active corpus: 150 → 65 → 29 at sf0.01).
    *
    * Shape: per-stage filters are pushed to the scan; each stage is a
    * groupBy + join on user_id, so the whole funnel rides user_id
    * hash partitioning — no broadcast of corpus data, no window over
    * the full event stream.
    */
  val qFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id")
      .where(col("ts") > col("t1") &&
             col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id")
      .where(col("ts") > col("t2") &&
             col("ts") <= col("t2") + expr("INTERVAL 24 HOUR"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val stage = (no: Int, name: String, df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(no).as("stage_no"), lit(name).as("stage"), col("n_users"))
    stage(1, "signup", s1)
      .unionAll(stage(2, "click_after_signup", s2))
      .unionAll(stage(3, "purchase_after_click", s3))
      .orderBy("stage_no")
  }

  val qFunnelSql: String =
    """WITH base AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
      |), s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM base
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), s2 AS (
      |  SELECT b.user_id, MIN(b.ts) AS t2 FROM base b
      |  JOIN s1 ON s1.user_id = b.user_id
      |  WHERE b.event_type = 'click' AND b.ts > s1.t1
      |    AND b.ts <= s1.t1 + INTERVAL 24 HOUR
      |  GROUP BY b.user_id
      |), s3 AS (
      |  SELECT b.user_id, MIN(b.ts) AS t3 FROM base b
      |  JOIN s2 ON s2.user_id = b.user_id
      |  WHERE b.event_type = 'purchase' AND b.ts > s2.t2
      |    AND b.ts <= s2.t2 + INTERVAL 24 HOUR
      |  GROUP BY b.user_id
      |)
      |SELECT CAST(1 AS INT) AS stage_no, 'signup' AS stage,
      |       COUNT(*) AS n_users FROM s1
      |UNION ALL
      |SELECT 2, 'click_after_signup', COUNT(*) FROM s2
      |UNION ALL
      |SELECT 3, 'purchase_after_click', COUNT(*) FROM s3
      |ORDER BY stage_no""".stripMargin

  /** Last-touch marketing attribution — for every purchase, find the
    * same user's most recent click and attribute the purchase (and its
    * value) to it iff the click happened within the preceding 24 h.
    * Per user: purchases, attributed purchases, attributed value. The
    * conversion-credit computation funnels/cohorts stop short of.
    *
    * Shape: ONE user_id exchange carries everything — the
    * last-click-so-far column is a running `last(..., ignoreNulls)`
    * over (ts, event_id) [the streaming-LOCF pattern of q_win_locf,
    * here across event types], the 24 h test is exact integer
    * microsecond arithmetic (`unix_micros`, no double seconds), and
    * the per-user rollup shares the window's partitioning so no second
    * shuffle exists. An as-of join (purchases asof clicks) computes the
    * same thing with two shuffles; the single-exchange window form wins
    * whenever both event streams live in one table.
    */
  val qAttribution: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("ts"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))),
             ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("attributed",
        col("last_click_us").isNotNull &&
        unix_micros(col("ts")) - col("last_click_us") <= lit(86400000000L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
           sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
           sum(when(col("attributed"), col("value")).otherwise(0.0)
                 .cast(DecimalType(18, 2))).cast("double")
             .as("attributed_value"))
      .orderBy("user_id")
  }

  val qAttributionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |         value
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), wc AS (
      |  SELECT user_id, event_type, ts, value,
      |    last_value(CASE WHEN event_type = 'click'
      |                    THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS last_click_us
      |  FROM ev
      |), p AS (
      |  SELECT user_id, value,
      |    last_click_us IS NOT NULL
      |      AND epoch_us(ts) - last_click_us <= 86400000000 AS attributed
      |  FROM wc WHERE event_type = 'purchase'
      |)
      |SELECT user_id, COUNT(*) AS n_purchases,
      |  CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_attributed,
      |  CAST(SUM(CAST(CASE WHEN attributed THEN value ELSE 0.0 END
      |                AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Trailing 24 h per-user rolling stats via a TIME-range frame — the
    * time-based complement to [[qWinRangeFrame]]'s numeric range: each
    * event sees the count and exact decimal sum of its user's events in
    * the preceding day, expressed as a RANGE frame over epoch
    * microseconds (integers, so both engines bound the frame
    * identically; an INTERVAL frame would hit each engine's own
    * timestamp frame arithmetic).
    *
    * At 100 TB: one user_id exchange; RANGE frames evaluate with a
    * sliding two-pointer over each partition's sorted run — no
    * per-row rescan, no self-join against a time spine.
    */
  val qWinRangeTime: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
              unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-86400000000L + 1, 0)
    e.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("sum_24h"))
      .orderBy("event_id")
  }

  val qWinRangeTimeSql: String =
    """SELECT event_id, user_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_24h,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    AS sum_24h
      |FROM (SELECT event_id, user_id, value,
      |        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** U-shaped (position-based) multi-touch attribution, purchase
    * grain — the multi-touch complement to [[qAttribution]]'s
    * last-touch: every click in the purchase's trailing 24 h shares
    * the credit 40/20/40 (first/middle/last; 100% solo, 50/50 for a
    * pair). Plan: purchases join clicks on user + time-window residual
    * (one user_id exchange, same shape as the as-of family), then ONE
    * purchase-keyed window ranks the touches and a purchase-grain
    * aggregate emits the endpoints and credits. Credits are row-local
    * rounds — no cross-row double accumulation to drift.
    *
    * At 100 TB: the join fans out purchases × their window clicks
    * (bounded by touches-per-day per user, a behavioral constant, not
    * a data-volume multiplier); everything downstream of the one
    * exchange is windowed + aggregated in the same partitioning.
    */
  val qAttributionPositional: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("ts"), col("value"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
              col("ts").as("pts"), col("value"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"),
              col("ts").as("cts"))
    val j = p.join(c,
      col("pu") === col("cu") && col("cts") <= col("pts") &&
      unix_micros(col("pts")) - unix_micros(col("cts")) <= lit(86400000000L))
    val w = Window.partitionBy("pid").orderBy("cts", "cid")
    val wn = Window.partitionBy("pid")
    // credits in EXACT decimal arithmetic: value is a true 2-dp
    // quantity, the weights are decimal literals, so half-ties (odd
    // cents × 0.5 = x.xx5 — every other pair!) land on an exact
    // decimal both engines round away-from-zero identically. Doubles
    // here diverged: Spark rounds the shortest repr, DuckDB the binary.
    // The middle share is reported as its exact POOL + touch count, not
    // pool/(n−2) — a division would reintroduce non-terminating
    // decimals and the double-rounding knife edge.
    val dec2 = DecimalType(18, 2)
    val vdec = max(col("value")).cast(dec2)
    val half = lit(new java.math.BigDecimal("0.5"))
    val forty = lit(new java.math.BigDecimal("0.4"))
    val fifth = lit(new java.math.BigDecimal("0.2"))
    j.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("pid")
      .agg(
        max(col("n")).as("n_touches"),
        max(when(col("rn") === 1, col("cid"))).as("first_click"),
        max(when(col("rn") === col("n"), col("cid"))).as("last_click"),
        round(when(max(col("n")) === 1, vdec)
          .when(max(col("n")) === 2, vdec * half)
          .otherwise(vdec * forty), 2).cast("double").as("first_credit"),
        round(when(max(col("n")) === 1, lit(0).cast(dec2))
          .when(max(col("n")) === 2, vdec * half)
          .otherwise(vdec * forty), 2).cast("double").as("last_credit"),
        round(when(max(col("n")) >= 3, vdec * fifth)
          .otherwise(lit(0).cast(dec2)), 2).cast("double").as("mid_pool"))
      .orderBy("pid")
  }

  val qAttributionPositionalSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |         value
      |  FROM events WHERE event_type IN ('click','purchase')
      |), p AS (
      |  SELECT user_id, event_id AS pid, ts AS pts, value FROM ev
      |  WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, event_id AS cid, ts AS cts FROM ev
      |  WHERE event_type = 'click'
      |), j AS (
      |  SELECT p.pid, p.value, c.cid, c.cts,
      |    row_number() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid)
      |      AS rn,
      |    count(*) OVER (PARTITION BY p.pid) AS n
      |  FROM p JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts
      |    AND epoch_us(p.pts) - epoch_us(c.cts) <= 86400000000
      |)
      |SELECT pid, CAST(max(n) AS BIGINT) AS n_touches,
      |  max(CASE WHEN rn = 1 THEN cid END) AS first_click,
      |  max(CASE WHEN rn = n THEN cid END) AS last_click,
      |  CAST(ROUND(CASE
      |    WHEN max(n) = 1 THEN CAST(max(value) AS DECIMAL(18,2))
      |    WHEN max(n) = 2 THEN CAST(max(value) AS DECIMAL(18,2))
      |                         * CAST(0.5 AS DECIMAL(2,1))
      |    ELSE CAST(max(value) AS DECIMAL(18,2))
      |         * CAST(0.4 AS DECIMAL(2,1)) END, 2) AS DOUBLE)
      |    AS first_credit,
      |  CAST(ROUND(CASE
      |    WHEN max(n) = 1 THEN CAST(0 AS DECIMAL(18,2))
      |    WHEN max(n) = 2 THEN CAST(max(value) AS DECIMAL(18,2))
      |                         * CAST(0.5 AS DECIMAL(2,1))
      |    ELSE CAST(max(value) AS DECIMAL(18,2))
      |         * CAST(0.4 AS DECIMAL(2,1)) END, 2) AS DOUBLE)
      |    AS last_credit,
      |  CAST(ROUND(CASE WHEN max(n) >= 3
      |    THEN CAST(max(value) AS DECIMAL(18,2))
      |         * CAST(0.2 AS DECIMAL(2,1))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END, 2) AS DOUBLE) AS mid_pool
      |FROM j GROUP BY pid ORDER BY pid""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_attribution_positional" -> qAttributionPositional,
    "q_win_range_time"  -> qWinRangeTime,
    "q_attribution"     -> qAttribution,
    "q_win_dist"        -> qWinDist,
    "q_win_rank"        -> qWinRank,
    "q_win_running"     -> qWinRunning,
    "q_win_lag_lead"    -> qWinLagLead,
    "q_win_range_frame" -> qWinRangeFrame,
    "q_win_topk_group"  -> qWinTopkGroup,
    "q_win_locf"        -> qWinLocf,
    "q_win_interpolate" -> qWinInterpolate,
    "q_scd2"            -> qScd2,
    "q_funnel"          -> qFunnel,
    "q_cohort_retention" -> qCohortRetention,
    "q_seq_pattern"     -> qSeqPattern,
    "q_sessionize"      -> qSessionize
  )

  val oracles: Map[String, String] = Map(
    "q_attribution_positional" -> qAttributionPositionalSql,
    "q_win_range_time"  -> qWinRangeTimeSql,
    "q_attribution"     -> qAttributionSql,
    "q_win_dist"        -> qWinDistSql,
    "q_win_rank"        -> qWinRankSql,
    "q_win_running"     -> qWinRunningSql,
    "q_win_lag_lead"    -> qWinLagLeadSql,
    "q_win_range_frame" -> qWinRangeFrameSql,
    "q_win_topk_group"  -> qWinTopkGroupSql,
    "q_win_locf"        -> qWinLocfSql,
    "q_win_interpolate" -> qWinInterpolateSql,
    "q_scd2"            -> qScd2Sql,
    "q_funnel"          -> qFunnelSql,
    "q_cohort_retention" -> qCohortRetentionSql,
    "q_seq_pattern"     -> qSeqPatternSql,
    "q_sessionize"      -> qSessionizeSql
  )
}

package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import util._

/** Round-16 wave: drift/eval/extremum/whitening/NN-join/inter-arrival
  * signals — monitoring and evaluation shapes a production pipeline
  * runs NEXT TO the curation queries (the reference delegates all of
  * this to Athena; README.md:2): population-stability drift between
  * two ingest windows, regression-style forecast error, per-group
  * argmax/argmin, embedding whitening, nearest-neighbor spatial join,
  * and inter-arrival latency percentiles. Every key is DuckDB-oracled
  * under the FP-parity discipline (integer/exact-decimal cores;
  * round-then-decimal-sum for any order-sensitive double sum; round-6
  * only on tie-free quotients).
  */
object Signals {

  // ---------------------------------------------------------------
  // q_dq_psi — population stability index between two windows.
  // ---------------------------------------------------------------

  private val PsiBins = 10 // fixed-width value bins, 50 units each

  /** PSI drift monitor — the standard "did the input distribution
    * move?" check between a reference window (first half of the month)
    * and the current window, per event type: `value` binned into 10
    * fixed 50-unit buckets, PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref)
    * with +0.5 Laplace smoothing per bin so an empty bucket cannot
    * produce ±∞. Counts are integers; the shares are identical double
    * quotients in both engines; each bin's PSI term is rounded to 8 dp
    * and DECIMAL-summed, so the 10-term sum is order-independent (the
    * q_stats_anova lesson). The 0.2 alert threshold sits far from the
    * measured values (max ≈ 0.03 at sf0.01, ≈ 0.003 at sf1).
    *
    * At 100 TB: one combining aggregate events→(type, window, bin) —
    * the exchange carries ≤ |types|·bins·2 rows; the PSI arithmetic
    * runs on that bounded table. New days only touch the current
    * window's partials, so the monitor incrementalizes for free.
    */
  val qDqPsi: Q = (s, d) => {
    val cut = lit("2024-01-16").cast("timestamp")
    val binned = Tables.events(s, d)
      .select(col("event_type"),
        (col("ts") < cut).as("is_ref"),
        least(lit(PsiBins - 1L),
          floor(col("value") / 50.0).cast("long")).as("bin"))
      .groupBy("event_type", "bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val byType = Window.partitionBy("event_type")
    val k = lit(PsiBins.toDouble * 0.5)
    val pRef = (col("c_ref").cast("double") + lit(0.5)) /
      (sum(col("c_ref")).over(byType).cast("double") + k)
    val pCur = (col("c_cur").cast("double") + lit(0.5)) /
      (sum(col("c_cur")).over(byType).cast("double") + k)
    binned
      .withColumn("term",
        round((pCur - pRef) * log(pCur / pRef), 8)
          .cast(DecimalType(18, 8)))
      .withColumn("t_ref", sum(col("c_ref")).over(byType))
      .withColumn("t_cur", sum(col("c_cur")).over(byType))
      .groupBy(col("event_type"))
      .agg(max(col("t_ref")).as("n_ref"), max(col("t_cur")).as("n_cur"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
      .orderBy("event_type")
  }

  val qDqPsiSql: String =
    """WITH binned AS (
      |  SELECT event_type,
      |    CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16' AS is_ref,
      |    least(9, CAST(floor(value / 50.0) AS BIGINT)) AS bin
      |  FROM events),
      |cnt AS (
      |  SELECT event_type, bin,
      |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
      |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
      |  FROM binned GROUP BY 1, 2),
      |terms AS (
      |  SELECT event_type, c_ref, c_cur,
      |    sum(c_ref) OVER w AS t_ref, sum(c_cur) OVER w AS t_cur,
      |    CAST(ROUND(
      |      ((CAST(c_cur AS DOUBLE) + 0.5) / (CAST(sum(c_cur) OVER w AS DOUBLE) + 5.0)
      |       - (CAST(c_ref AS DOUBLE) + 0.5) / (CAST(sum(c_ref) OVER w AS DOUBLE) + 5.0))
      |      * ln(((CAST(c_cur AS DOUBLE) + 0.5) / (CAST(sum(c_cur) OVER w AS DOUBLE) + 5.0))
      |           / ((CAST(c_ref AS DOUBLE) + 0.5) / (CAST(sum(c_ref) OVER w AS DOUBLE) + 5.0))),
      |      8) AS DECIMAL(18,8)) AS term
      |  FROM cnt WINDOW w AS (PARTITION BY event_type))
      |SELECT event_type, CAST(max(t_ref) AS BIGINT) AS n_ref,
      |  CAST(max(t_cur) AS BIGINT) AS n_cur,
      |  ROUND(CAST(sum(term) AS DOUBLE), 6) AS psi,
      |  ROUND(CAST(sum(term) AS DOUBLE), 6) > 0.2 AS drifted
      |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_eval_regression — forecast error metrics (MAE/RMSE/MAPE/R²).
  // ---------------------------------------------------------------

  /** Regression-error battery for a forecast — the eval family's
    * missing quadrant next to classification (AUC/confusion),
    * calibration, and ranking (NDCG/AP): a naive seasonal lag-7
    * forecast of daily event counts scored with MAE, RMSE, MAPE, and
    * R². Actuals and forecasts are integer counts, so every sum of
    * squares/abs errors is EXACT BIGINT arithmetic; R² uses the
    * computational identity SS_tot = Σa² − (Σa)²/n (no mean-centered
    * double sum to drift); MAPE's per-day quotient is rounded to 8 dp
    * and DECIMAL-summed. Only tie-free final quotients get round-6.
    *
    * At 100 TB: firehose→daily is one combining aggregate; the lag
    * window and the metrics run on the bounded |types|×|days| series.
    */
  val qEvalRegression: Q = (s, d) => {
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("a"))
      .withColumn("f", lag(col("a"), 7).over(byDay))
      .where(col("f").isNotNull)
    val err = col("a") - col("f")
    daily
      .select(col("event_type"), col("a"), col("f"),
        abs(err).as("ae"), (err * err).as("se"),
        round(abs(err).cast("double") / col("a").cast("double"), 8)
          .cast(DecimalType(18, 8)).as("ape"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("ae")).as("sae"), sum(col("se")).as("sse"),
        sum(col("ape")).as("sape"),
        sum(col("a")).as("sa"), sum(col("a") * col("a")).as("saa"))
      .select(col("event_type"), col("n_days"),
        round(col("sae").cast("double") / col("n_days").cast("double"), 6)
          .as("mae"),
        round(sqrt(col("sse").cast("double") / col("n_days").cast("double")), 6)
          .as("rmse"),
        round(col("sape").cast("double") / col("n_days").cast("double"), 6)
          .as("mape"),
        round(lit(1.0) - col("sse").cast("double") /
          (col("saa").cast("double") -
            col("sa").cast("double") * col("sa").cast("double") /
              col("n_days").cast("double")), 6).as("r2"))
      .orderBy("event_type")
  }

  val qEvalRegressionSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS a
      |  FROM events GROUP BY 1, 2),
      |fc AS (
      |  SELECT event_type, a,
      |    lag(a, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
      |  FROM daily),
      |e AS (
      |  SELECT event_type, a, f, abs(a - f) AS ae,
      |    (a - f) * (a - f) AS se,
      |    CAST(ROUND(CAST(abs(a - f) AS DOUBLE) / CAST(a AS DOUBLE), 8)
      |         AS DECIMAL(18,8)) AS ape
      |  FROM fc WHERE f IS NOT NULL),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(ae) AS BIGINT) AS sae, CAST(sum(se) AS BIGINT) AS sse,
      |    sum(ape) AS sape, CAST(sum(a) AS BIGINT) AS sa,
      |    CAST(sum(a * a) AS BIGINT) AS saa
      |  FROM e GROUP BY 1)
      |SELECT event_type, n_days,
      |  ROUND(CAST(sae AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mae,
      |  ROUND(sqrt(CAST(sse AS DOUBLE) / CAST(n_days AS DOUBLE)), 6) AS rmse,
      |  ROUND(CAST(sape AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mape,
      |  ROUND(1.0 - CAST(sse AS DOUBLE) /
      |    (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) /
      |      CAST(n_days AS DOUBLE)), 6) AS r2
      |FROM m ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q_agg_argmax — per-group extremum carriers via max_by/min_by.
  // ---------------------------------------------------------------

  /** Per-group argmax/argmin — "who is the top spender per event
    * type?" answered with Spark's `max_by`/`min_by` COMBINING
    * aggregates instead of a rank window: user totals (exact decimal)
    * feed one aggregate whose ordering key is the (total, user_id)
    * STRUCT, so ties break deterministically without a second pass.
    * The DuckDB oracle re-derives both extrema with rank windows
    * (its arg_max takes no composite key), pinning the same rows.
    *
    * At 100 TB this is the shape that replaces "rank then filter
    * rn = 1": max_by partials combine map-side, so the top/bottom
    * carrier costs ONE exchange of |groups| rows — the rank
    * formulation shuffles and sorts the full user-total table.
    */
  val qAggArgmax: Q = (s, d) => {
    // ordering key stays the EXACT DECIMAL(18,2) sum — the oracle's
    // rank windows order on the exact decimal, and a double cast here
    // could collide two cent-distinct totals at large magnitudes and
    // tie-break differently cross-engine; double appears only in the
    // output projection
    val totals = Tables.events(s, d)
      .groupBy("event_type", "user_id")
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("total"))
    val key = struct(col("total"), col("user_id"))
    val carrier = struct(col("user_id").as("u"), col("total").as("t"))
    totals.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        max_by(carrier, key).as("mx"),
        min_by(carrier, key).as("mn"))
      .select(col("event_type"), col("n_users"),
        col("mx.u").as("top_user"),
        col("mx.t").cast("double").as("top_total"),
        col("mn.u").as("bottom_user"),
        col("mn.t").cast("double").as("bottom_total"))
      .orderBy("event_type")
  }

  val qAggArgmaxSql: String =
    s"""WITH totals AS (
      |  SELECT event_type, user_id,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS total
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, user_id, total,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY total DESC, user_id DESC) AS rmax,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY total ASC, user_id ASC) AS rmin
      |  FROM totals)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |  max(CASE WHEN rmax = 1 THEN user_id END) AS top_user,
      |  CAST(max(CASE WHEN rmax = 1 THEN total END) AS DOUBLE) AS top_total,
      |  max(CASE WHEN rmin = 1 THEN user_id END) AS bottom_user,
      |  CAST(max(CASE WHEN rmin = 1 THEN total END) AS DOUBLE) AS bottom_total
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_embed_whiten — per-dimension standardization audit.
  // ---------------------------------------------------------------

  /** Embedding whitening (per-dimension z-score) — the preprocessing
    * step before cosine/PQ when dimensions have unequal scale, audited
    * per vector: every coordinate is standardized against its
    * dimension's corpus mean/sd and the output reports each vector's
    * mean z and max |z| (the "is any coordinate an outlier after
    * whitening?" screen). Moments are exact decimals (6-dp elements,
    * exact decimal squares), so both engines derive bit-identical
    * mean/sd doubles; per-element z is a tie-free quotient rounded to
    * 6 dp, and the per-vector total DECIMAL-sums those rounded values,
    * keeping the 64-term sum order-independent. The output carries the
    * exact 6-dp SUM (not the mean): dividing the 1e-6-granular sum by
    * d = 64 = 2⁶ is binary-exact, so the quotient can land exactly ON
    * a 0.5e-6 rounding boundary — a STRUCTURAL half-tie Spark
    * (decimal-string) and DuckDB (binary) break differently; sf0.01
    * vec_id 69 hit it on the first run.
    *
    * At 100 TB: one d-row stats aggregate (broadcast back), one
    * map-side recompute per element, one vec_id re-aggregate — the
    * only full exchange carries one row per vector.
    */
  val qEmbedWhiten: Q = (s, d) => {
    val dec6 = DecimalType(9, 6)
    val el = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        round(col("col").cast("double"), 6).as("x"))
    val stats = el.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec6)).as("sx"),
        sum((col("x").cast(dec6) * col("x").cast(dec6))).as("sxx"))
      .select(col("dim"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") /
            col("n").cast("double")) /
          (col("n").cast("double") - lit(1.0))).as("sd"))
    el.join(broadcast(stats), "dim")
      .select(col("vec_id"),
        round((col("x") - col("mean")) / col("sd"), 6).as("z"))
      .groupBy("vec_id")
      .agg(
        sum(col("z").cast(DecimalType(18, 6))).cast("double").as("sum_z"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy("vec_id")
  }

  val qEmbedWhitenSql: String =
    """WITH el AS (
      |  SELECT vec_id, g.i AS dim,
      |    ROUND(CAST(embedding[g.i + 1] AS DOUBLE), 6) AS x
      |  FROM embeddings,
      |       UNNEST(generate_series(0, len(embedding) - 1)) AS g(i)),
      |stats AS (
      |  SELECT dim,
      |    CAST(sum(CAST(x AS DECIMAL(9,6))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS mean,
      |    sqrt((CAST(sum(CAST(x AS DECIMAL(9,6)) * CAST(x AS DECIMAL(9,6)))
      |            AS DOUBLE)
      |          - CAST(sum(CAST(x AS DECIMAL(9,6))) AS DOUBLE)
      |            * CAST(sum(CAST(x AS DECIMAL(9,6))) AS DOUBLE)
      |            / CAST(count(*) AS DOUBLE))
      |         / (CAST(count(*) AS DOUBLE) - 1.0)) AS sd
      |  FROM el GROUP BY 1),
      |z AS (
      |  SELECT el.vec_id, ROUND((el.x - stats.mean) / stats.sd, 6) AS z
      |  FROM el JOIN stats ON el.dim = stats.dim)
      |SELECT vec_id,
      |  CAST(sum(CAST(z AS DECIMAL(18,6))) AS DOUBLE) AS sum_z,
      |  ROUND(max(abs(z)), 6) AS max_abs_z
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_join_spatial_nn — grid-bucketed nearest-neighbor join in 2-D.
  // ---------------------------------------------------------------

  /** Radius² budget: r² = budget / |views|, so the EXPECTED in-radius
    * candidates per probe — |views|·πr²/area = π·budget/area ≈ 23 —
    * is a CONSTANT at every scale factor. Both engines derive r² by
    * the same exact integer division from the same count.
    */
  private val NnPairBudget = 32000000000L

  /** Nearest-neighbor spatial JOIN — for every click point, the single
    * closest view point within radius r (not the pair histogram
    * q_join_spatial_grid reports): the same md5-lattice-free integer
    * coordinates and 3×3 grid-probe candidate generation, then ONE
    * min(struct(dist², id)) aggregate per probe point picks the
    * neighbor with a deterministic (d², id) tie-break — a combining
    * aggregate, not a rank window, so partials collapse map-side.
    * All arithmetic is exact integers.
    *
    * The radius is DENSITY-ADAPTIVE: r² = [[NnPairBudget]] / |views|
    * (exact integer division both engines replay), because a fixed
    * radius makes in-radius pairs grow quadratically with density —
    * measured ×9.8 wall on ×10 data before the change. With the
    * budget, per-probe candidate work is ~constant at any corpus size
    * (the occupancy knob the scaladoc of q_join_spatial_grid describes,
    * made self-tuning); the cell edge is the smallest power of two
    * ≥ r, derived by integer doubling — no floating log whose rounding
    * could diverge.
    *
    * At 100 TB: one count action sizes the radius (a scalar, like the
    * PQ codebook sample), candidates per point stay ~π·budget/area
    * regardless of scale, the argmin shuffles one row per (point,
    * partial) — never the candidate list — and the output is one row
    * per matched probe point, linear in input.
    */
  val qJoinSpatialNn: Q = (s, d) => {
    def pts(tpe: String, prefix: String): DataFrame = {
      val h = md5(col("event_id").cast("string"))
      Tables.events(s, d).where(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"),
          conv(substring(h, 1, 4), 16, 10).cast("long").as(s"${prefix}x"),
          conv(substring(h, 5, 4), 16, 10).cast("long").as(s"${prefix}y"))
    }
    val views0 = pts("view", "b")
    val r2 = NnPairBudget / math.max(1L, views0.count())
    var cell = 64L
    while (cell * cell < r2) cell <<= 1
    val clicks = pts("click", "a")
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("a_id"), col("ax"), col("ay"),
        (expr(s"ax DIV $cell") + col("dx")).as("cx"),
        (expr(s"ay DIV $cell") + col("dy")).as("cy"))
    val views = views0
      .withColumn("cx", expr(s"bx DIV $cell"))
      .withColumn("cy", expr(s"by DIV $cell"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    clicks.join(views, Seq("cx", "cy"))
      .withColumn("d2", d2)
      .where(col("d2") <= lit(r2))
      .groupBy(col("a_id"))
      .agg(min(struct(col("d2"), col("b_id"))).as("mn"))
      .select(col("a_id"), col("mn.b_id").as("nn_id"),
        col("mn.d2").as("nn_d2"))
      .orderBy("a_id")
  }

  val qJoinSpatialNnSql: String = {
    def hex(e: String, st: Int, n: Int): String =
      s"CAST(('0x' || substring(md5($e), $st, $n)) AS BIGINT)"
    s"""WITH pts AS (
      |  SELECT event_id, event_type,
      |    ${hex("CAST(event_id AS VARCHAR)", 1, 4)} AS x,
      |    ${hex("CAST(event_id AS VARCHAR)", 5, 4)} AS y
      |  FROM events WHERE event_type IN ('click', 'view')),
      |r2 AS (
      |  SELECT CAST($NnPairBudget AS BIGINT)
      |         // greatest(1, count(*)) AS r2
      |  FROM pts WHERE event_type = 'view'),
      |pairs AS (
      |  SELECT a.event_id AS a_id, b.event_id AS b_id,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM pts a JOIN pts b
      |    ON a.event_type = 'click' AND b.event_type = 'view'
      |   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |       <= (SELECT r2 FROM r2))
      |SELECT a_id, b_id AS nn_id, d2 AS nn_d2
      |FROM pairs
      |QUALIFY row_number() OVER (PARTITION BY a_id ORDER BY d2, b_id) = 1
      |ORDER BY a_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q_time_interarrival — per-type inter-event latency percentiles.
  // ---------------------------------------------------------------

  /** Inter-arrival latency — the cadence profile per event type: the
    * microsecond gap between a user's consecutive events of that type
    * (one lag window keyed (type, user) with an event_id tie-break for
    * equal timestamps), summarized as n / mean / exact-rank p50 / p90
    * / max. Gaps are exact integers; the mean is an integer-sum
    * quotient; the percentiles use the rn = ceil(q·n) EXACT-rank pick
    * (the q_funnel_latency pattern) so no interpolation double ever
    * crosses engines.
    *
    * At 100 TB: the lag window shuffles once on (type, user) — the
    * same key the sessionizer uses, so the exchange is shareable; the
    * percentile windows run per type over the gap table, and the
    * output is |types| rows.
    */
  val qTimeInterarrival: Q = (s, d) => {
    val byUser = Window.partitionBy("event_type", "user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val gaps = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .where(col("prev_us").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
    val byGap = Window.partitionBy("event_type")
      .orderBy(col("gap_us").asc)
    val whole = Window.partitionBy("event_type")
    gaps
      .withColumn("rn", row_number().over(byGap).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("p50", ceil(col("n") * 0.5).cast("long"))
      .withColumn("p90", ceil(col("n") * 0.9).cast("long"))
      .groupBy(col("event_type"), col("n"))
      .agg(
        round(sum(col("gap_us")).cast("double") / col("n").cast("double"), 2)
          .as("mean_us"),
        max(when(col("rn") === col("p50"), col("gap_us"))).as("p50_us"),
        max(when(col("rn") === col("p90"), col("gap_us"))).as("p90_us"),
        max(col("gap_us")).as("max_us"))
      .select(col("event_type"), col("n").as("n_gaps"), col("mean_us"),
        col("p50_us"), col("p90_us"), col("max_us"))
      .orderBy("event_type")
  }

  val qTimeInterarrivalSql: String =
    """WITH gaps AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |          OVER (PARTITION BY event_type, user_id
      |                ORDER BY ts ASC, event_id ASC) AS gap_us
      |  FROM events),
      |g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL),
      |r AS (
      |  SELECT event_type, gap_us,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |                            ORDER BY gap_us ASC) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM g)
      |SELECT event_type, n AS n_gaps,
      |  ROUND(CAST(sum(gap_us) AS DOUBLE) / CAST(n AS DOUBLE), 2) AS mean_us,
      |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
      |           THEN gap_us END) AS p50_us,
      |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
      |           THEN gap_us END) AS p90_us,
      |  max(gap_us) AS max_us
      |FROM r GROUP BY event_type, n ORDER BY event_type""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_dq_psi"            -> qDqPsi,
    "q_eval_regression"   -> qEvalRegression,
    "q_agg_argmax"        -> qAggArgmax,
    "q_embed_whiten"      -> qEmbedWhiten,
    "q_join_spatial_nn"   -> qJoinSpatialNn,
    "q_time_interarrival" -> qTimeInterarrival)

  val oracles: Map[String, String] = Map(
    "q_dq_psi"            -> qDqPsiSql,
    "q_eval_regression"   -> qEvalRegressionSql,
    "q_agg_argmax"        -> qAggArgmaxSql,
    "q_embed_whiten"      -> qEmbedWhitenSql,
    "q_join_spatial_nn"   -> qJoinSpatialNnSql,
    "q_time_interarrival" -> qTimeInterarrivalSql)
}

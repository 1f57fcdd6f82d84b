package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import util._

/** Round-15 wave: ranking/calibration evaluation, corpus-curation
  * vocabulary ops, a 2-D grid-bucketed spatial join, and a compaction
  * planner — the remaining quality-measurement and lake-maintenance
  * shapes a training-data pipeline runs between ingest and training.
  *
  * Reference analog: the reference stops at materializing the lake and
  * delegates analytics to Athena (README.md:2); these are the
  * evaluate-the-derived-artifacts queries (is the ranking good? is the
  * score calibrated? which vocabulary survives df pruning? which
  * boilerplate contaminates the corpus?) plus the small-file compaction
  * planning every parquet lake eventually needs.
  *
  * Cross-engine exactness: every operator here is integer/decimal
  * arithmetic end to end — NDCG uses 6-dp DECIMAL discount literals
  * generated once and embedded in BOTH engines' plans (no libm log2 at
  * query time), calibration bins/labels derive from md5 hex digits,
  * the spatial join compares exact integer squared distances, and the
  * compaction planner is pure integer running sums — so every round-6
  * output is a single IEEE operation on identical operands.
  */
object Quality {

  // ---------------------------------------------------------------
  // q_eval_ndcg — graded ranking quality (NDCG@10) per query group.
  // ---------------------------------------------------------------

  /** 6-dp discount table disc(i) = round(1/log2(i+1), 6), i = 1..10.
    * Computed ONCE here and spliced as DECIMAL literals into both the
    * Spark plan and the DuckDB oracle, so the one libm touchpoint
    * (log2) happens at class-init in one place — query-time arithmetic
    * is gain(int) × disc(decimal), exact in both engines.
    */
  private val NdcgK = 10
  private[graft] val ndcgDisc: IndexedSeq[String] =
    (1 to NdcgK).map { i =>
      BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
    }

  private def ndcgDiscCase(posCol: String): String =
    s"CASE $posCol " +
      ndcgDisc.zipWithIndex.map { case (v, i) =>
        s"WHEN ${i + 1} THEN CAST($v AS DECIMAL(8,6))" }.mkString(" ") +
      " ELSE CAST(0 AS DECIMAL(8,6)) END"

  /** NDCG@10 of a system ranking against graded relevance, one query
    * group per event_type: items are users, the SYSTEM ranks by event
    * count, relevance grades (3..0) come from exact-cents value
    * quartiles — so the metric asks "does ranking by activity recover
    * the value ordering?". DCG = Σ (2^grade − 1) · disc(pos) with the
    * shared 6-dp discount table; DCG/IDCG accumulate in DECIMAL
    * (exact), and NDCG is one round-6 division of identical doubles.
    * Ties are broken by user_id everywhere, so both engines rank
    * identically; IDCG's tie-break is grade-only, which cannot change
    * the top-10 gain multiset.
    *
    * At 100 TB: one combining aggregate events→(type, user), two
    * windows partitioned by type (ntile for grades, row_number for
    * positions), one |types|-row rollup. The per-type window sort is
    * the only superlinear step and shards by query group — the
    * standard offline ranking-eval shape.
    */
  val qEvalNdcg: Q = (s, d) => {
    val users = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
    val byValue = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("user_id").asc)
    val graded = users
      .withColumn("rel", lit(4) - ntile(4).over(byValue))
      .withColumn("gain",
        expr("CASE rel WHEN 3 THEN 7L WHEN 2 THEN 3L WHEN 1 THEN 1L ELSE 0L END"))
    val bySystem = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("user_id").asc)
    val byIdeal = Window.partitionBy("event_type")
      .orderBy(col("gain").desc, col("user_id").asc)
    graded
      .withColumn("sys_pos", row_number().over(bySystem))
      .withColumn("ideal_pos", row_number().over(byIdeal))
      .withColumn("sys_disc", expr(ndcgDiscCase("sys_pos")))
      .withColumn("ideal_disc", expr(ndcgDiscCase("ideal_pos")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("sys_pos") <= NdcgK, col("gain") * col("sys_disc")))
          .cast("double").as("dcg10"),
        sum(when(col("ideal_pos") <= NdcgK, col("gain") * col("ideal_disc")))
          .cast("double").as("idcg10"))
      .withColumn("ndcg10", round(col("dcg10") / col("idcg10"), 6))
      .orderBy("event_type")
  }

  val qEvalNdcgSql: String =
    s"""WITH users AS (
      |  SELECT event_type, user_id, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |graded AS (
      |  SELECT event_type, user_id, n,
      |    CASE 4 - ntile(4) OVER (PARTITION BY event_type
      |                            ORDER BY cents DESC, user_id ASC)
      |      WHEN 3 THEN CAST(7 AS BIGINT) WHEN 2 THEN 3 WHEN 1 THEN 1
      |      ELSE 0 END AS gain
      |  FROM users),
      |pos AS (
      |  SELECT event_type, gain,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY n DESC, user_id ASC) AS sys_pos,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY gain DESC, user_id ASC) AS ideal_pos
      |  FROM graded)
      |SELECT event_type, count(*) AS n_items,
      |  CAST(sum(CASE WHEN sys_pos <= $NdcgK
      |    THEN gain * (${ndcgDiscCase("sys_pos")}) END) AS DOUBLE) AS dcg10,
      |  CAST(sum(CASE WHEN ideal_pos <= $NdcgK
      |    THEN gain * (${ndcgDiscCase("ideal_pos")}) END) AS DOUBLE) AS idcg10,
      |  ROUND(CAST(sum(CASE WHEN sys_pos <= $NdcgK
      |          THEN gain * (${ndcgDiscCase("sys_pos")}) END) AS DOUBLE) /
      |        CAST(sum(CASE WHEN ideal_pos <= $NdcgK
      |          THEN gain * (${ndcgDiscCase("ideal_pos")}) END) AS DOUBLE), 6)
      |    AS ndcg10
      |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_eval_calibration — reliability diagram + per-bin ECE gaps.
  // ---------------------------------------------------------------

  /** DuckDB spelling of "hex digits [start, start+n) of md5(expr) as an
    * integer" — the [[graft.queries.Maintain.qSampleConsistent]] strpos
    * recipe generalized to n digits.
    */
  private def duckHexInt(expr: String, start: Int, n: Int): String =
    (0 until n).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
      s"($acc) * 16 + strpos('0123456789abcdef', substr(md5($expr), ${start + k}, 1)) - 1"
    }

  /** Calibration audit of a model score — the reliability-diagram
    * binning every production classifier gets before its threshold is
    * trusted: scores bucket into 10 equal-width bins; each bin reports
    * count, positives, mean predicted probability, observed positive
    * rate, and the |gap| that, frequency-weighted, sums to ECE.
    *
    * The score is a deterministic md5-derived uniform over [0, 65536)
    * (hex digits 1–4 of md5(doc_id)) and the label draws hex digits
    * 5–8 as an independent uniform with P(label=1|score) = score/65536
    * — calibrated by construction, so the audit machinery is exercised
    * against a known-calibrated model and the gate pins the exact
    * per-bin integers. Everything is integer until the final
    * divisions: bin = score·10 div 65536, mean-pred and pos-rate are
    * single divisions of exact integer sums — identical doubles in
    * both engines, so the round-6 cannot straddle a tie.
    *
    * At 100 TB: row-local hashing, one 10-key combining aggregate —
    * the cheapest possible audit shape.
    */
  val qEvalCalibration: Q = (s, d) => {
    val h = md5(col("doc_id").cast("string"))
    val score = conv(substring(h, 1, 4), 16, 10).cast("long")
    val lab = conv(substring(h, 5, 4), 16, 10).cast("long")
    Tables.documents(s, d)
      .select(score.as("score_u"),
        when(lab < score, 1L).otherwise(0L).as("label"))
      .groupBy(expr("score_u * 10 DIV 65536").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("label")).as("n_pos"),
        sum(col("score_u")).as("sum_u"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sum_u").cast("double") /
          (col("n").cast("double") * lit(65536.0)), 6).as("avg_pred"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(abs(col("sum_u").cast("double") /
            (col("n").cast("double") * lit(65536.0)) -
          col("n_pos").cast("double") / col("n").cast("double")), 6)
          .as("gap"))
      .orderBy("bin")
  }

  val qEvalCalibrationSql: String =
    s"""WITH scored AS (
      |  SELECT ${duckHexInt("CAST(doc_id AS VARCHAR)", 1, 4)} AS score_u,
      |    CASE WHEN (${duckHexInt("CAST(doc_id AS VARCHAR)", 5, 4)}) <
      |              (${duckHexInt("CAST(doc_id AS VARCHAR)", 1, 4)})
      |         THEN 1 ELSE 0 END AS label
      |  FROM documents),
      |b AS (
      |  SELECT score_u * 10 // 65536 AS bin, count(*) AS n,
      |    CAST(sum(label) AS BIGINT) AS n_pos,
      |    CAST(sum(score_u) AS BIGINT) AS sum_u
      |  FROM scored GROUP BY 1)
      |SELECT bin, n, n_pos,
      |  ROUND(CAST(sum_u AS DOUBLE) / (CAST(n AS DOUBLE) * 65536.0), 6)
      |    AS avg_pred,
      |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
      |  ROUND(abs(CAST(sum_u AS DOUBLE) / (CAST(n AS DOUBLE) * 65536.0) -
      |            CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap
      |FROM b ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------
  // q_text_docfreq_prune — min_df / max_df vocabulary pruning census.
  // ---------------------------------------------------------------

  private val MinDf = 5       // token must appear in ≥ 5 docs
  private val MaxDfPct = 3    // ...and in ≤ 30% of docs (×10 scale)

  /** Document-frequency vocabulary pruning (min_df=5, max_df=30%) —
    * the sklearn/tf-idf preprocessing step at corpus scale: tokens too
    * rare to learn from and tokens so common they carry no signal are
    * both dropped; the census reports, per source, how much of the
    * vocabulary and of the token MASS survives. The max_df bound is
    * compared as df·10 ≤ 3·N (pure integers; N is a bounded driver-side
    * count, the PQ-codebook precedent).
    *
    * At 100 TB: token instances flow through ONE token-keyed combining
    * exchange to build df; the instance stream joins the bounded
    * surviving-vocab set back on the same key (shuffle-hash); the final
    * rollup is |sources| rows. Nothing is ever collected but the one
    * corpus count.
    */
  val qTextDocfreqPrune: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val nDocs = docs.count() // bounded: one scalar
    val inst = docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, src, text) =>
        text.split(" ").filter(_.nonEmpty).map(t => (id, src, t)) }
      .toDF("doc_id", "source", "tok")
    val df = inst.select(col("doc_id"), col("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val flagged = inst.join(df.hint("shuffle_hash"), "tok")
      .withColumn("kept",
        col("df") >= MinDf && col("df") * 10 <= lit(MaxDfPct) * nDocs)
    flagged.groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_tokens_kept"),
        countDistinct(col("tok")).as("vocab_seen"),
        countDistinct(when(col("kept"), col("tok"))).as("vocab_kept"))
      .withColumn("kept_ratio",
        round(col("n_tokens_kept").cast("double") /
          col("n_tokens").cast("double"), 6))
      .orderBy("source")
  }

  val qTextDocfreqPruneSql: String =
    s"""WITH inst AS (
      |  SELECT doc_id, source, t.tok AS tok
      |  FROM documents,
      |    UNNEST(list_filter(string_split(text, ' '),
      |                       x -> length(x) > 0)) AS t(tok)),
      |df AS (
      |  SELECT tok, count(DISTINCT doc_id) AS df FROM inst GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |flagged AS (
      |  SELECT inst.source, inst.tok,
      |    df.df >= $MinDf AND df.df * 10 <= $MaxDfPct * (SELECT n_docs FROM n)
      |      AS kept
      |  FROM inst JOIN df USING (tok))
      |SELECT source, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_tokens_kept,
      |  count(DISTINCT tok) AS vocab_seen,
      |  count(DISTINCT CASE WHEN kept THEN tok END) AS vocab_kept,
      |  ROUND(CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE), 6) AS kept_ratio
      |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_text_boilerplate — cross-document repeated-shingle detection.
  // ---------------------------------------------------------------

  private val ShingleW = 5
  private val BoilerDocs = 3 // a shingle in ≥ 3 distinct docs is boilerplate

  /** All word 5-gram shingle INSTANCES of a text (step 1, duplicates
    * kept — boilerplate mass is counted per occurrence); empty below
    * 5 tokens.
    */
  private[graft] def shingles(text: String): Array[String] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < ShingleW) Array.empty
    else toks.sliding(ShingleW).map(_.mkString(" ")).toArray
  }

  /** Boilerplate census — the headers/footers/licence-block screen of a
    * web-scale curation pipeline: a word 5-gram shingle occurring in ≥
    * 3 DISTINCT documents is boilerplate (only planted near-duplicates
    * and true template text repeat verbatim across documents at this
    * shingle width); per source the census reports document/shingle
    * volume, the boilerplate instance share (round-6 of an exact
    * integer ratio), and the distinct boilerplate vocabulary.
    *
    * At 100 TB: shingle instances flow through one shingle-keyed
    * combining exchange for df, then join the (small, df ≥ 3) boiler
    * set back per instance — the q_text_docfreq_prune shape one level
    * up (shingles, not tokens). No all-pairs anything.
    */
  val qTextBoilerplate: Q = (s, d) => {
    import s.implicits._
    val inst = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, src, text) =>
        shingles(text).map(g => (id, src, g)) }
      .toDF("doc_id", "source", "shingle")
    val df = inst.select(col("doc_id"), col("shingle")).distinct()
      .groupBy("shingle").agg(count(lit(1)).as("nd"))
    val boiler = df.where(col("nd") >= BoilerDocs).select(col("shingle"))
      .withColumn("is_boiler", lit(true))
    inst.join(boiler.hint("shuffle_hash"), Seq("shingle"), "left")
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_shingles"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
        countDistinct(when(col("is_boiler"), col("shingle")))
          .as("boiler_vocab"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast("double") /
          col("n_shingles").cast("double"), 6))
      .orderBy("source")
  }

  val qTextBoilerplateSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS ts
      |  FROM documents),
      |inst AS (
      |  SELECT doc_id, source,
      |    array_to_string(list_slice(ts, g.i, g.i + ${ShingleW - 1}), ' ')
      |      AS shingle
      |  FROM toks, UNNEST(generate_series(1, len(ts) - ${ShingleW - 1}))
      |    AS g(i)
      |  WHERE len(ts) >= $ShingleW),
      |df AS (
      |  SELECT shingle, count(DISTINCT doc_id) AS nd FROM inst GROUP BY 1),
      |j AS (
      |  SELECT inst.source, inst.doc_id, inst.shingle,
      |    df.nd >= $BoilerDocs AS is_boiler
      |  FROM inst JOIN df USING (shingle))
      |SELECT source, count(DISTINCT doc_id) AS n_docs,
      |  count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boiler,
      |  count(DISTINCT CASE WHEN is_boiler THEN shingle END)
      |    AS boiler_vocab,
      |  ROUND(CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_join_spatial_grid — grid-bucketed radius join in 2-D.
  // ---------------------------------------------------------------

  private val GridCell = 512      // cell edge; must be ≥ radius for 3×3
  private val Radius2 = 250000L   // radius 500, compared as exact dist²

  /** Radius join in two dimensions — the spatial/geo shape (points
    * within distance r across two sets) that a naive plan makes a
    * cartesian product: both sides bucket into a 512-unit grid (cell
    * edge ≥ radius, so every qualifying pair is in the SAME or an
    * ADJACENT cell), the probe side replicates to its 3×3 neighbor
    * cells via a 9-row explode, and the join is a pure EQUI-join on
    * the cell key with the exact integer dist² ≤ r² residual — the
    * 2-D generalization of q_join_range_banded's 1-D banding. Each
    * qualifying pair is found exactly once (each point owns one cell;
    * the shifted copies live on the click side only). Coordinates are
    * md5-derived integers in [0, 65536)² (hex digits 1–4 / 5–8 —
    * integer-multiply hashes lattice at small N and starve the join),
    * so the distance predicate and the binned output are pure integer
    * arithmetic — nothing to round, nothing to flake.
    *
    * Output is the dist²-binned pair histogram (counts + exact integer
    * dist² extrema/sums), NOT the pair list: the histogram is
    * scale-stable output while the pair count grows with density² —
    * the right contract for a join whose result feeds an aggregate.
    *
    * At 100 TB: candidate pairs per task are bounded by (points per
    * cell)² × 9 — the grid size tunes occupancy the way LSH band width
    * tunes bucket size; the exchange carries each side once (plus the
    * 9× probe replication), never the cross product.
    */
  val qJoinSpatialGrid: Q = (s, d) => {
    def pts(tpe: String, prefix: String): DataFrame = {
      val h = md5(col("event_id").cast("string"))
      Tables.events(s, d).where(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"),
          conv(substring(h, 1, 4), 16, 10).cast("long").as(s"${prefix}x"),
          conv(substring(h, 5, 4), 16, 10).cast("long").as(s"${prefix}y"))
    }
    val clicks = pts("click", "a")
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("a_id"), col("ax"), col("ay"),
        (expr(s"ax DIV $GridCell") + col("dx")).as("cx"),
        (expr(s"ay DIV $GridCell") + col("dy")).as("cy"))
    val views = pts("view", "b")
      .withColumn("cx", expr(s"bx DIV $GridCell"))
      .withColumn("cy", expr(s"by DIV $GridCell"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    clicks.join(views, Seq("cx", "cy"))
      .withColumn("d2", d2)
      .where(col("d2") <= Radius2)
      .groupBy(expr(s"d2 * 10 DIV $Radius2").as("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("d2")).as("min_d2"),
        max(col("d2")).as("max_d2"),
        sum(col("d2")).as("sum_d2"))
      .orderBy("bin")
  }

  val qJoinSpatialGridSql: String =
    s"""WITH pts AS (
      |  SELECT event_id, event_type,
      |    ${duckHexInt("CAST(event_id AS VARCHAR)", 1, 4)} AS x,
      |    ${duckHexInt("CAST(event_id AS VARCHAR)", 5, 4)} AS y
      |  FROM events WHERE event_type IN ('click', 'view')),
      |pairs AS (
      |  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM pts a JOIN pts b
      |    ON a.event_type = 'click' AND b.event_type = 'view'
      |   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |       <= $Radius2)
      |SELECT d2 * 10 // $Radius2 AS bin, count(*) AS n_pairs,
      |  min(d2) AS min_d2, max(d2) AS max_d2,
      |  CAST(sum(d2) AS BIGINT) AS sum_d2
      |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_maintain_compaction_plan — target-size small-file bin packing.
  // ---------------------------------------------------------------

  private val CompactTarget = 65536L // bytes per compaction output

  /** Compaction planning — the OPTIMIZE/rewrite-small-files step every
    * parquet lake schedules: within each source (standing in for a
    * table partition), files (documents; n_chars as bytes) are walked
    * in key order and assigned to output bins by the running byte
    * total — a file opens a new bin when the bytes BEFORE it already
    * fill the 64 KiB target (bin = prefix-sum div target: the
    * streaming first-fit rule, deterministic and windowed, no driver
    * loop). The plan reports each bin's file count, byte total, and
    * key range — what the rewrite job would execute.
    *
    * At 100 TB: one window per partition (the per-partition file list
    * is metadata, small by definition) and a (partition, bin) rollup;
    * planning cost is proportional to file-list size, never data size.
    */
  val qMaintainCompactionPlan: Q = (s, d) => {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("bin",
        expr(s"(cum - n_chars) DIV $CompactTarget"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("min_key"),
        max(col("doc_id")).as("max_key"))
      .orderBy("source", "bin")
  }

  val qMaintainCompactionPlanSql: String =
    s"""WITH f AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS cum
      |  FROM documents)
      |SELECT source, CAST((cum - n_chars) // $CompactTarget AS BIGINT) AS bin,
      |  count(*) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  min(doc_id) AS min_key, max(doc_id) AS max_key
      |FROM f GROUP BY 1, 2 ORDER BY source, bin""".stripMargin

  // ---------------------------------------------------------------
  // q_eval_avg_precision — ranked-retrieval AP over the user ranking.
  // ---------------------------------------------------------------

  /** Average precision (the area under the precision-recall curve in
    * its rank-sum form) of the user-value ranking against the purchaser
    * label — [[graft.queries.Maintain.qEvalAuc]]'s companion for the
    * class-imbalanced regime where ROC flatters: AP = mean over
    * positives of precision@rank. Every precision@k is rounded to 6 dp
    * and summed in DECIMAL (the PSI discipline — a raw double sum over
    * |positives| quotient terms is order-dependent), then one division
    * by n_pos. The ranking tie-breaks by user_id, so both engines sort
    * identically.
    *
    * At 100 TB: events collapse to one row per user first (combining
    * aggregate), so the global rank-order window sorts USERS, not
    * events — the same bounded-domain trick as q_eval_auc; precision@k
    * is a running sum over that sorted domain.
    */
  val qEvalAvgPrecision: Q = (s, d) => {
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("score"),
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .select(col("user_id"), col("score"),
        when(col("np") * 5 > col("n"), 1L).otherwise(0L).as("label"))
    val byScore = Window.orderBy(col("score").desc, col("user_id").asc)
    val ranked = users
      .withColumn("rn", row_number().over(byScore))
      .withColumn("cum_pos", sum(col("label")).over(
        byScore.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.agg(
      count(lit(1)).as("n_users"),
      sum(col("label")).as("n_pos"),
      sum(when(col("label") === 1,
        round(col("cum_pos").cast("double") / col("rn").cast("double"), 6)
          .cast(DecimalType(18, 6)))).as("ap_sum"),
      max(when(col("rn") === 100, col("cum_pos"))).as("pos_at_100"))
      .select(col("n_users"), col("n_pos"),
        round(col("ap_sum").cast("double") / col("n_pos").cast("double"), 6)
          .as("avg_precision"),
        round(col("pos_at_100").cast("double") / lit(100.0), 6)
          .as("p_at_100"))
  }

  val qEvalAvgPrecisionSql: String =
    """WITH users AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS score,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |              * 5 > count(*) THEN 1 ELSE 0 END AS label
      |  FROM events GROUP BY user_id),
      |ranked AS (
      |  SELECT label,
      |    row_number() OVER (ORDER BY score DESC, user_id ASC) AS rn,
      |    CAST(sum(label) OVER (ORDER BY score DESC, user_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
      |  FROM users)
      |SELECT count(*) AS n_users,
      |  CAST(sum(label) AS BIGINT) AS n_pos,
      |  ROUND(CAST(sum(CASE WHEN label = 1 THEN CAST(
      |      ROUND(CAST(cum_pos AS DOUBLE) / CAST(rn AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) END) AS DOUBLE) /
      |    CAST(sum(label) AS DOUBLE), 6) AS avg_precision,
      |  ROUND(CAST(max(CASE WHEN rn = 100 THEN cum_pos END) AS DOUBLE)
      |    / 100.0, 6) AS p_at_100
      |FROM ranked""".stripMargin

  // ---------------------------------------------------------------
  // q_eval_lang_f1 — per-class precision/recall/F1 of the language ID.
  // ---------------------------------------------------------------

  /** Per-language precision/recall/F1 of [[LlmOps.qTextLangid]]'s
    * n-gram classifier against the labeled `lang` column — the
    * per-class evaluation every classifier in the curation stack gets
    * (q_eval_confusion is the binary form; this is multi-class,
    * composed DIRECTLY on the langid query so the metric always scores
    * the shipped classifier, not a copy). F1 is computed as the single
    * quotient 2·tp / (2·tp + fp + fn) — exact integers in, one round-6
    * division out; classes the model never predicts report NULL
    * precision/F1 rather than a divide-by-zero.
    *
    * At 100 TB: adds one |langs|²-bounded rollup on top of langid's
    * own aggregate — evaluation rides the classifier's plan.
    */
  val qEvalLangF1: Q = (s, d) => {
    val pred = graft.queries.LlmOps.qTextLangid(s, d)
      .select(col("labeled_lang"), col("pred_lang"))
    val langs = pred.select(col("labeled_lang").as("lang")).distinct()
    val tp = pred.where(col("labeled_lang") === col("pred_lang"))
      .groupBy(col("labeled_lang").as("lang"))
      .agg(count(lit(1)).as("tp"))
    val byTrue = pred.groupBy(col("labeled_lang").as("lang"))
      .agg(count(lit(1)).as("n_true"))
    val byPred = pred.groupBy(col("pred_lang").as("lang"))
      .agg(count(lit(1)).as("n_pred"))
    langs.join(tp, Seq("lang"), "left")
      .join(byTrue, Seq("lang"), "left")
      .join(byPred, Seq("lang"), "left")
      .select(col("lang"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("n_true"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double"), 6)))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          round((lit(2) * col("tp")).cast("double") /
            (lit(2) * col("tp") + col("fp") + col("fn")).cast("double"), 6)))
      .orderBy("lang")
  }

  /** Oracle: the full langid SQL as a CTE, then the same confusion
    * rollup — regenerated from the SAME marker tables, so a classifier
    * change reprices both engines together.
    */
  def qEvalLangF1Sql: String =
    s"""WITH pred AS (
      |${graft.queries.LlmOps.qTextLangidSql}
      |),
      |langs AS (SELECT DISTINCT labeled_lang AS lang FROM pred),
      |tp AS (
      |  SELECT labeled_lang AS lang, count(*) AS tp FROM pred
      |  WHERE labeled_lang = pred_lang GROUP BY 1),
      |bt AS (
      |  SELECT labeled_lang AS lang, count(*) AS n_true
      |  FROM pred GROUP BY 1),
      |bp AS (
      |  SELECT pred_lang AS lang, count(*) AS n_pred
      |  FROM pred GROUP BY 1),
      |c AS (
      |  SELECT langs.lang,
      |    CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
      |    CAST(coalesce(bp.n_pred, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fp,
      |    CAST(coalesce(bt.n_true, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fn
      |  FROM langs LEFT JOIN tp USING (lang)
      |    LEFT JOIN bt USING (lang) LEFT JOIN bp USING (lang))
      |SELECT lang, tp, fp, fn,
      |  CASE WHEN tp + fp > 0 THEN
      |    ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END
      |    AS precision,
      |  CASE WHEN tp + fn > 0 THEN
      |    ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END
      |    AS recall,
      |  CASE WHEN 2 * tp + fp + fn > 0 THEN
      |    ROUND(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE), 6)
      |    END AS f1
      |FROM c ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q_stats_mad — median/MAD robust outlier screen on the day series.
  // ---------------------------------------------------------------

  /** Robust (median/MAD) outlier screen over the per-(type, day) count
    * series — the heavy-tail-proof twin of the z-score anomaly ops: a
    * single wild day shifts a mean/stddev baseline but not the median,
    * so MAD flags the spike without poisoning its own threshold.
    * Exactness: counts are integers, so the interpolated median and
    * MAD live on the exact .5 grid in both engines; the robust z
    * (x − med) / (1.4826 · mad) is arithmetic on those exact values —
    * identical doubles, one round-6. mad = 0 (constant series) reports
    * NULL z rather than ±inf.
    *
    * At 100 TB: one firehose→(type, day) combining aggregate, then
    * everything runs on the bounded day series per type (two tiny
    * percentile aggregates + broadcast joins back).
    */
  val qStatsMad: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(n, 0.5D)").as("med"))
    val withMed = daily.join(broadcast(med), "event_type")
    val mad = withMed.groupBy("event_type")
      .agg(expr("percentile(abs(n - med), 0.5D)").as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .select(col("event_type"),
        col("day").cast("timestamp").as("day"), col("n"),
        round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"),
        when(col("mad") > 0,
          round((col("n") - col("med")) / (lit(1.4826) * col("mad")), 6))
          .as("robust_z"))
      .withColumn("outlier",
        coalesce(abs(col("robust_z")) > 3.5, lit(false)))
      .orderBy("event_type", "day")
  }

  val qStatsMadSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
      |    AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, quantile_cont(n, 0.5) AS med
      |  FROM daily GROUP BY 1),
      |mad AS (
      |  SELECT daily.event_type,
      |    quantile_cont(abs(n - med), 0.5) AS mad
      |  FROM daily JOIN med USING (event_type) GROUP BY 1)
      |SELECT event_type, day, n,
      |  ROUND(med, 6) AS med, ROUND(mad, 6) AS mad,
      |  CASE WHEN mad > 0 THEN
      |    ROUND((n - med) / (1.4826 * mad), 6) END AS robust_z,
      |  coalesce(CASE WHEN mad > 0 THEN
      |    abs(ROUND((n - med) / (1.4826 * mad), 6)) > 3.5 END, false)
      |    AS outlier
      |FROM daily JOIN med USING (event_type) JOIN mad USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  // q_sample_dedup_weight — dedup-aware sampling weights (soft dedup).
  // ---------------------------------------------------------------

  /** Dedup-aware sampling weights — the SOFT alternative to dropping
    * near-duplicates that large-scale training pipelines use: each
    * document in a verified near-dup cluster weighs 1/|cluster| (the
    * cluster contributes one document's worth of mass in expectation),
    * singletons weigh 1. Reported per source: raw vs EFFECTIVE
    * document and character mass — the numbers that decide epoch
    * sizing after dedup. Consumes the SAME memoized
    * LSH→verify→label-propagation chain as the near-dup keys (a 4th
    * consumer of one materialization); the DuckDB oracle re-derives
    * the clusters through the recursive-CTE transitive closure, so the
    * weighting is gated end-to-end from raw text.
    *
    * Exactness: w = round(1/|cluster|, 6) as DECIMAL(18,6); effective
    * masses are exact decimal sums (n_chars·w stays within
    * DECIMAL(38,6)); the final ratio is one IEEE division.
    *
    * At 100 TB: one |clusters|-row aggregate over the (∝ dup rate)
    * label artifact, one broadcast-shaped join back to the corpus
    * rollup — no pairwise work outside the already-shared chain.
    */
  val qSampleDedupWeight: Q = (s, d) => {
    val labels = graft.queries.LlmOps.qDedupNearClusters(s, d)
      .select(col("doc_id"), col("cluster_id"))
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("csize"))
    val weighted = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(labels.join(sizes, "cluster_id"), Seq("doc_id"), "left")
      .withColumn("w",
        round(lit(1.0) / coalesce(col("csize"), lit(1L)).cast("double"), 6)
          .cast(DecimalType(18, 6)))
    weighted.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("w")).cast("double").as("eff_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(col("n_chars").cast(DecimalType(18, 0)) * col("w"))
          .cast("double").as("eff_chars"))
      .withColumn("eff_ratio",
        round(col("eff_docs") / col("n_docs").cast("double"), 6))
      .orderBy("source")
  }

  def qSampleDedupWeightSql: String =
    s"""WITH labels AS (
      |  SELECT * FROM (
      |${graft.queries.LlmOps.clustersCteBody}
      |  ) l),
      |sizes AS (
      |  SELECT cluster_id, count(*) AS csize FROM labels GROUP BY 1),
      |w AS (
      |  SELECT doc.source, doc.n_chars,
      |    CAST(ROUND(1.0 / coalesce(s.csize, 1), 6) AS DECIMAL(18,6)) AS w,
      |    CASE WHEN s.csize > 1 THEN 1 ELSE 0 END AS dup
      |  FROM documents doc
      |  LEFT JOIN labels l ON doc.doc_id = l.doc_id
      |  LEFT JOIN sizes s ON l.cluster_id = s.cluster_id)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(dup) AS BIGINT) AS n_dup_docs,
      |  CAST(sum(w) AS DOUBLE) AS eff_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
      |  CAST(sum(CAST(n_chars AS DECIMAL(18,0)) * w) AS DOUBLE)
      |    AS eff_chars,
      |  ROUND(CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS eff_ratio
      |FROM w GROUP BY 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // q_dq_uniqueness — candidate-key uniqueness audit.
  // ---------------------------------------------------------------

  /** Candidate-key uniqueness audit — the "is this actually a primary
    * key?" check a modeling pass runs before declaring constraints:
    * for each candidate (single and composite), row count vs distinct
    * count, duplicate-row mass, and the uniqueness ratio. Exact
    * integers; one round-6 quotient each.
    *
    * At 100 TB: one combining count-distinct-shaped aggregate per
    * candidate (each a hash exchange on the candidate's columns); the
    * union of 4-row results is metadata-sized.
    */
  val qDqUniqueness: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def audit(name: String, keyCols: Seq[String]): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
        countDistinct(keyCols.head, keyCols.tail: _*).as("n_distinct"))
        .select(lit(name).as("candidate"), col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("dup_rows"),
          round(col("n_distinct").cast("double") /
            col("n_rows").cast("double"), 6).as("uniqueness"),
          (col("n_rows") === col("n_distinct")).as("is_key"))
    audit("o_orderkey", Seq("o_orderkey"))
      .unionByName(audit("o_custkey", Seq("o_custkey")))
      .unionByName(audit("o_custkey,o_orderdate",
        Seq("o_custkey", "o_orderdate")))
      .unionByName(audit("o_orderdate", Seq("o_orderdate")))
      .orderBy("candidate")
  }

  val qDqUniquenessSql: String = {
    def one(name: String, expr: String): String =
      s"""SELECT '$name' AS candidate, count(*) AS n_rows,
         |  count(DISTINCT $expr) AS n_distinct,
         |  count(*) - count(DISTINCT $expr) AS dup_rows,
         |  ROUND(CAST(count(DISTINCT $expr) AS DOUBLE) /
         |        CAST(count(*) AS DOUBLE), 6) AS uniqueness,
         |  count(*) = count(DISTINCT $expr) AS is_key
         |FROM orders""".stripMargin
    Seq(one("o_orderkey", "o_orderkey"),
      one("o_custkey", "o_custkey"),
      one("o_custkey,o_orderdate", "(o_custkey, o_orderdate)"),
      one("o_orderdate", "o_orderdate"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY candidate")
  }

  // ---------------------------------------------------------------
  // q_join_null_safe — null-safe equality join (<=>).
  // ---------------------------------------------------------------

  /** Null-safe equality join — the `<=>` / IS NOT DISTINCT FROM
    * semantics a late-bound dimension key needs: rows whose key is
    * NULL (here a planted `user_id % 97 = 0` stripe standing in for
    * "unresolved") MATCH EACH OTHER instead of silently dropping out
    * as they would under `=`. Spark plans `<=>` as a hash join (the
    * key is wrapped in a null-coalescing struct), so the null stripe
    * costs one hash bucket, not a fallback nested loop — asserted in
    * QualitySpec. The rollup reports matched pairs and distinct keys
    * for the null and non-null branches separately, so the gate pins
    * exactly the semantics difference vs `=`.
    *
    * NULL-BUCKET MITIGATION (the r15 ADVICE scale item): under `<=>`
    * every null-keyed row hashes to ONE bucket and null×null matches
    * grow quadratically with the stripe — materializing those pairs
    * just to count them is a one-task blowup at 100 TB. Since the
    * rollup only needs counts, the null stripe is computed
    * ANALYTICALLY: two 1-row stripe aggregates (count + distinct ids)
    * cross-joined (broadcast scalar), n_pairs = n_clicks × n_views by
    * the cross-product semantics of `<=>` on an all-null key. The
    * `<=>` hash join runs only on the non-null branch, where it is an
    * ordinary equi-join. A workload that needs the PAIR LIST (not
    * counts) over a hot null stripe would salt the null key into k
    * sub-buckets on one side and replicate the other — the skew-join
    * recipe — but for a count rollup the analytic form is exact and
    * O(stripe), not O(stripe²).
    */
  val qJoinNullSafe: Q = (s, d) => {
    def side(tpe: String, k: String, v: String): DataFrame =
      Tables.events(s, d).where(col("event_type") === tpe)
        .select(when(col("user_id") % 97 === 0, lit(null))
          .otherwise(col("user_id")).as(k),
          col("event_id").as(v))
    val clicks = side("click", "ck", "click_id")
    val views = side("view", "vk", "view_id")
    val nonNull = clicks.where(col("ck").isNotNull)
      .join(views.where(col("vk").isNotNull), col("ck") <=> col("vk"))
      .groupBy(col("ck").isNull.as("null_key"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks"),
        countDistinct(col("view_id")).as("n_views"))
    // the all-null bucket, in closed form: every null click pairs with
    // every null view, so the join would emit cn×vn rows whose distinct
    // id counts are just the stripes' own. Guard on BOTH stripes
    // non-empty — an empty side means the join emits no null_key row.
    val nullC = clicks.where(col("ck").isNull)
      .agg(count(lit(1)).as("cn"),
        countDistinct(col("click_id")).as("cd"))
    val nullV = views.where(col("vk").isNull)
      .agg(count(lit(1)).as("vn"),
        countDistinct(col("view_id")).as("vd"))
    val nullRow = nullC.crossJoin(nullV) // 1×1 scalar cross
      .where(col("cn") > 0 && col("vn") > 0)
      .select(lit(true).as("null_key"),
        (col("cn") * col("vn")).as("n_pairs"),
        col("cd").as("n_clicks"), col("vd").as("n_views"))
    nonNull.unionByName(nullRow).orderBy("null_key")
  }

  val qJoinNullSafeSql: String =
    """WITH c AS (
      |  SELECT CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END AS ck,
      |    event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |v AS (
      |  SELECT CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END AS vk,
      |    event_id AS view_id
      |  FROM events WHERE event_type = 'view'),
      |nn AS (
      |  SELECT FALSE AS null_key, count(*) AS n_pairs,
      |    count(DISTINCT c.click_id) AS n_clicks,
      |    count(DISTINCT v.view_id) AS n_views
      |  FROM c JOIN v ON c.ck IS NOT DISTINCT FROM v.vk
      |  WHERE c.ck IS NOT NULL GROUP BY 1),
      |nc AS (SELECT count(*) AS cn, count(DISTINCT click_id) AS cd
      |       FROM c WHERE ck IS NULL),
      |nv AS (SELECT count(*) AS vn, count(DISTINCT view_id) AS vd
      |       FROM v WHERE vk IS NULL)
      |SELECT null_key, n_pairs, n_clicks, n_views FROM nn
      |UNION ALL
      |SELECT TRUE AS null_key, cn * vn AS n_pairs, cd AS n_clicks,
      |  vd AS n_views
      |FROM nc, nv WHERE cn > 0 AND vn > 0
      |ORDER BY null_key""".stripMargin

  // ---------------------------------------------------------------
  // q_time_wow_change — week-over-week growth with decline streaks.
  // ---------------------------------------------------------------

  /** Week-over-week growth per event type — the BI staple: weekly
    * counts, the round-6 WoW change ratio (one quotient of exact
    * integers; NULL on the first week), and the running length of the
    * current decline streak (consecutive weeks with fewer events than
    * the one before — integer window arithmetic, the islands trick).
    *
    * At 100 TB: one firehose→(type, week) combining aggregate; the
    * windows run on the bounded weekly series per type.
    */
  val qTimeWowChange: Q = (s, d) => {
    val byWk = Window.partitionBy("event_type").orderBy("wk")
    val weekly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev", lag(col("n"), 1).over(byWk))
      .withColumn("wow",
        when(col("prev").isNotNull,
          round((col("n") - col("prev")).cast("double") /
            col("prev").cast("double"), 6)))
      .withColumn("decline",
        (col("prev").isNotNull && col("n") < col("prev")).cast("int"))
    // islands: a decline streak's id is (weeks so far) − (declines so
    // far); the running streak length is a count over that group
    weekly
      .withColumn("grp",
        row_number().over(byWk) - sum(col("decline")).over(
          byWk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("decline_streak",
        when(col("decline") === 1,
          count(lit(1)).over(Window.partitionBy("event_type", "grp")
            .orderBy("wk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
          .otherwise(lit(0L)))
      .select(col("event_type"), col("wk"), col("n"), col("prev"),
        col("wow"), col("decline_streak"))
      .orderBy("event_type", "wk")
  }

  val qTimeWowChangeSql: String =
    """WITH weekly AS (
      |  SELECT event_type,
      |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, wk, n,
      |    lag(n) OVER tw AS prev,
      |    CASE WHEN lag(n) OVER tw IS NOT NULL THEN
      |      ROUND(CAST(n - lag(n) OVER tw AS DOUBLE) /
      |            CAST(lag(n) OVER tw AS DOUBLE), 6) END AS wow,
      |    CASE WHEN lag(n) OVER tw IS NOT NULL AND n < lag(n) OVER tw
      |      THEN 1 ELSE 0 END AS decline
      |  FROM weekly WINDOW tw AS (PARTITION BY event_type ORDER BY wk)),
      |g AS (
      |  SELECT *,
      |    row_number() OVER tw
      |      - CAST(sum(decline) OVER (PARTITION BY event_type ORDER BY wk
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
      |  FROM w WINDOW tw AS (PARTITION BY event_type ORDER BY wk))
      |SELECT event_type, wk, n, prev, wow,
      |  CASE WHEN decline = 1 THEN
      |    count(*) OVER (PARTITION BY event_type, grp ORDER BY wk
      |      ROWS UNBOUNDED PRECEDING) - 1
      |  ELSE 0 END AS decline_streak
      |FROM g ORDER BY event_type, wk""".stripMargin

  // ---------------------------------------------------------------
  // q_agg_grouping_id — GROUPING SETS provenance flags.
  // ---------------------------------------------------------------

  /** GROUPING SETS with provenance — the part of the rollup surface
    * q_agg_gsets doesn't pin: `grouping()` / `grouping_id()` flags that
    * let a consumer tell a REAL null key from a superaggregate row
    * (the reason the functions exist). Three sets (detail, per-flag,
    * grand total) with per-set counts and exact decimal sums; both
    * engines assign grouping bits MSB-first in column-list order.
    *
    * At 100 TB: Spark plans grouping sets as one Expand (3× the input
    * rows, map-side) into a single combining aggregate — one exchange,
    * same as q_agg_gsets.
    */
  val qAggGroupingId: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val qAggGroupingIdSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  ${dsumSql("l_extendedprice")} AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin

  // ---------------------------------------------------------------
  // q_win_nth_value — milestone extraction per key.
  // ---------------------------------------------------------------

  /** Milestone extraction with `nth_value` — per customer, the first /
    * second / third order (and days from first to second), the
    * activation-funnel readout a growth team pulls: one full-frame
    * window per customer, rows deduplicated to one milestone row per
    * key. The order (date, key) is unique, so both engines pick the
    * same rows; day deltas are exact integer date arithmetic.
    *
    * At 100 TB: one exchange on the key, per-key frames bounded by
    * orders-per-customer; the distinct collapses map-side.
    */
  val qWinNthValue: Q = (s, d) => {
    val full = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"),
        first(col("o_orderkey")).over(full).as("first_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_order"),
        datediff(nth_value(col("o_orderdate"), 2).over(full),
          first(col("o_orderdate")).over(full)).as("days_to_second"))
      .distinct()
      .orderBy("o_custkey")
  }

  val qWinNthValueSql: String =
    """SELECT DISTINCT o_custkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  nth_value(o_orderkey, 2) OVER w AS second_order,
      |  nth_value(o_orderkey, 3) OVER w AS third_order,
      |  date_diff('day', first_value(CAST(o_orderdate AS DATE)) OVER w,
      |    nth_value(CAST(o_orderdate AS DATE), 2) OVER w)
      |    AS days_to_second
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING
      |                      AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q_time_rfm — recency/frequency/monetary segmentation.
  // ---------------------------------------------------------------

  /** RFM segmentation — the classic user-value triage: per user,
    * recency (days since last event, against the corpus max day),
    * frequency (event count), monetary (exact decimal value sum), each
    * quintile-scored (recent/frequent/high-value = 5) with user_id
    * tie-breaks so both engines bucket identically, and the
    * concatenated 3-digit segment. Integers and exact decimals
    * throughout — nothing to round but the stored monetary total.
    *
    * At 100 TB: one combining aggregate events→users; the quintile
    * windows run on the bounded user table (global ntile = the same
    * bounded-domain sort q_eval_avg_precision documents).
    */
  val qTimeRfm: Q = (s, d) => {
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("f"),
        dsum(col("value")).as("m"))
    val all = Window.partitionBy()
    val scored = users
      .withColumn("r_days",
        datediff(max(col("last_day")).over(all), col("last_day")))
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("r_days").desc, col("user_id").asc)))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("f").asc, col("user_id").asc)))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("m").asc, col("user_id").asc)))
    scored.select(col("user_id"), col("r_days"), col("f"), col("m"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score"))
          .as("segment"))
      .orderBy("user_id")
  }

  val qTimeRfmSql: String =
    """WITH users AS (
      |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
      |    count(*) AS f,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m
      |  FROM events GROUP BY 1),
      |rec AS (
      |  SELECT user_id,
      |    date_diff('day', last_day, max(last_day) OVER ()) AS r_days,
      |    f, m
      |  FROM users),
      |scored AS (
      |  SELECT user_id, r_days, f, m,
      |    ntile(5) OVER (ORDER BY r_days DESC, user_id ASC) AS r_score,
      |    ntile(5) OVER (ORDER BY f ASC, user_id ASC) AS f_score,
      |    ntile(5) OVER (ORDER BY m ASC, user_id ASC) AS m_score
      |  FROM rec)
      |SELECT user_id, CAST(r_days AS INTEGER) AS r_days, f, m,
      |  r_score, f_score, m_score,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
      |    CAST(m_score AS VARCHAR) AS segment
      |FROM scored ORDER BY user_id""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_agg_grouping_id"        -> qAggGroupingId,
    "q_win_nth_value"          -> qWinNthValue,
    "q_time_rfm"               -> qTimeRfm,
    "q_sample_dedup_weight"    -> qSampleDedupWeight,
    "q_dq_uniqueness"          -> qDqUniqueness,
    "q_join_null_safe"         -> qJoinNullSafe,
    "q_time_wow_change"        -> qTimeWowChange,
    "q_eval_avg_precision"     -> qEvalAvgPrecision,
    "q_eval_lang_f1"           -> qEvalLangF1,
    "q_stats_mad"              -> qStatsMad,
    "q_eval_ndcg"              -> qEvalNdcg,
    "q_eval_calibration"       -> qEvalCalibration,
    "q_text_docfreq_prune"     -> qTextDocfreqPrune,
    "q_text_boilerplate"       -> qTextBoilerplate,
    "q_join_spatial_grid"      -> qJoinSpatialGrid,
    "q_maintain_compaction_plan" -> qMaintainCompactionPlan)

  val oracles: Map[String, String] = Map(
    "q_agg_grouping_id"        -> qAggGroupingIdSql,
    "q_win_nth_value"          -> qWinNthValueSql,
    "q_time_rfm"               -> qTimeRfmSql,
    "q_sample_dedup_weight"    -> qSampleDedupWeightSql,
    "q_dq_uniqueness"          -> qDqUniquenessSql,
    "q_join_null_safe"         -> qJoinNullSafeSql,
    "q_time_wow_change"        -> qTimeWowChangeSql,
    "q_eval_avg_precision"     -> qEvalAvgPrecisionSql,
    "q_eval_lang_f1"           -> qEvalLangF1Sql,
    "q_stats_mad"              -> qStatsMadSql,
    "q_eval_ndcg"              -> qEvalNdcgSql,
    "q_eval_calibration"       -> qEvalCalibrationSql,
    "q_text_docfreq_prune"     -> qTextDocfreqPruneSql,
    "q_text_boilerplate"       -> qTextBoilerplateSql,
    "q_join_spatial_grid"      -> qJoinSpatialGridSql,
    "q_maintain_compaction_plan" -> qMaintainCompactionPlanSql)
}

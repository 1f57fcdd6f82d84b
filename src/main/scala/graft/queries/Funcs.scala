package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import util._

/** Scalar function families (SURVEY.md §2.3). Each key exercises several
  * functions from one family; reference analogs cited per query. The
  * DuckDB oracle need only be result-equivalent, so where DuckDB spells a
  * function differently (string_split, strftime, CASE-for-map) the oracle
  * uses the DuckDB spelling.
  *
  * All of these are built-in column expressions — whole-stage-codegen
  * friendly, no UDFs in the hot path (SURVEY.md §2.4).
  */
object Funcs {

  /** String family — reference analogs: E3 regex extract (extractor.py:52),
    * F3 tile-string rendering, F13 URL decode.
    */
  val qFnString: Q = (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_type")).as("type_l"),
      substring(col("p_name"), 1, 5).as("name5"),
      length(col("p_name")).cast("long").as("name_len"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      regexp_extract(col("p_brand"), "#(\\d+)$", 1).as("brand_num"),
      concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
      regexp_replace(col("p_name"), " ", "_").as("name_u"),
      trim(lit("  pad  ")).as("trimmed"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad")
    ).orderBy("p_partkey")

  val qFnStringSql: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  lower(p_type) AS type_l,
      |  substring(p_name, 1, 5) AS name5,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  regexp_extract(p_brand, '#(\d+)$', 1) AS brand_num,
      |  concat_ws('|', p_brand, p_type) AS bt,
      |  regexp_replace(p_name, ' ', '_', 'g') AS name_u,
      |  trim('  pad  ') AS trimmed,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date family — reference analogs: `%Y%m%d` parse (main.py:23),
    * `dt=%Y-%m-%d` partition format (scrape.py:613), days-since-epoch id
    * (F9, scrape.py:447).
    */
  val qFnDate: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("dstr"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30")
    ).orderBy("o_orderkey")

  val qFnDateSql: String =
    """SELECT o_orderkey,
      |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
      |  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  strftime(o_orderdate, '%Y-%m-%d') AS dstr,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      |    AS days_since,
      |  o_orderdate + INTERVAL 30 DAY AS plus30
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Math / bit family — reference analogs: F1 meld bit-packing
    * (scrape.py:212), F7 GO-flag decode (`&`, `>>`), F8 `%4` seat math.
    */
  val qFnMath: Q = (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      pmod(col("l_orderkey"), lit(7)).cast("long").as("km7"),
      floor(col("l_orderkey") / 7).cast("long").as("kdiv7"),
      shiftleft(col("l_linenumber").cast("long"), 3).as("ln_shl"),
      shiftright(col("l_orderkey"), 2).as("k_shr"),
      col("l_linenumber").cast("long").bitwiseAND(5L).as("ln_and"),
      col("l_linenumber").cast("long").bitwiseOR(8L).as("ln_or"),
      col("l_linenumber").cast("long").bitwiseXOR(3L).as("ln_xor"),
      abs(col("l_quantity") - 25).as("q_dist"),
      greatest(col("l_quantity"), lit(25.0)).as("q_hi"),
      least(col("l_quantity"), lit(25.0)).as("q_lo"),
      round(sqrt(col("l_quantity")), 6).as("q_sqrt")
      // q_sqrt totalizes the order: (l_orderkey, l_linenumber) has
      // duplicates in the data, and tied rows differ only by quantity
    ).orderBy("l_orderkey", "l_linenumber", "q_sqrt")

  val qFnMathSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_orderkey % 7 AS km7,
      |  l_orderkey // 7 AS kdiv7,
      |  CAST(l_linenumber AS BIGINT) << 3 AS ln_shl,
      |  l_orderkey >> 2 AS k_shr,
      |  CAST(l_linenumber AS BIGINT) & 5 AS ln_and,
      |  CAST(l_linenumber AS BIGINT) | 8 AS ln_or,
      |  xor(CAST(l_linenumber AS BIGINT), 3) AS ln_xor,
      |  abs(l_quantity - 25) AS q_dist,
      |  greatest(l_quantity, 25.0) AS q_hi,
      |  least(l_quantity, 25.0) AS q_lo,
      |  ROUND(sqrt(l_quantity), 6) AS q_sqrt
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, q_sqrt""".stripMargin

  /** Array family — reference analogs: F2 `transform` over dora arrays,
    * F11 `aggregate` han-sum, array columns in haipais/agaris
    * (scrape.py:68,78,102). Arrays are built from integer-exact values so
    * folds are engine-exact; the oracle computes the same results with
    * scalar arithmetic (result-equivalence, not mechanism-equivalence).
    */
  val qFnArray: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        array(col("l_linenumber").cast("long"),
              pmod(col("l_orderkey"), lit(97)).cast("long"),
              col("l_quantity").cast("long")).as("arr"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("arr_sum"),
        aggregate(transform(col("arr"), x => x * 2), lit(0L), (acc, x) => acc + x)
          .as("arr_sum2"),
        array_contains(col("arr"), 3L).as("has3"),
        array_min(col("arr")).cast("long").as("amin"),
        array_max(col("arr")).cast("long").as("amax"),
        sort_array(col("arr")).getItem(1).as("amid"),
        size(col("arr")).cast("long").as("alen"),
        explode(sequence(lit(1), col("l_linenumber"))).as("seq_elem"))
      .withColumn("seq_elem", col("seq_elem").cast("long"))
      // arr_sum totalizes among duplicate (l_orderkey, l_linenumber)
      // rows (they differ only by quantity, which arr_sum embeds)
      .orderBy("l_orderkey", "l_linenumber", "arr_sum", "seq_elem")

  val qFnArraySql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_linenumber + (l_orderkey % 97) + CAST(l_quantity AS BIGINT) AS arr_sum,
      |  2 * (l_linenumber + (l_orderkey % 97) + CAST(l_quantity AS BIGINT)) AS arr_sum2,
      |  (l_linenumber = 3 OR (l_orderkey % 97) = 3
      |    OR CAST(l_quantity AS BIGINT) = 3) AS has3,
      |  least(CAST(l_linenumber AS BIGINT), l_orderkey % 97,
      |        CAST(l_quantity AS BIGINT)) AS amin,
      |  greatest(CAST(l_linenumber AS BIGINT), l_orderkey % 97,
      |           CAST(l_quantity AS BIGINT)) AS amax,
      |  list_sort([CAST(l_linenumber AS BIGINT), l_orderkey % 97,
      |             CAST(l_quantity AS BIGINT)])[2] AS amid,
      |  CAST(3 AS BIGINT) AS alen,
      |  CAST(unnest(generate_series(1, l_linenumber)) AS BIGINT) AS seq_elem
      |FROM lineitem WHERE l_orderkey % 10 = 0
      |ORDER BY l_orderkey, l_linenumber, arr_sum, seq_elem""".stripMargin

  /** Struct / map family — reference analogs: F5/F6 lookup tables,
    * `agaris.yaku` list<struct> (scrape.py:91-101). DuckDB oracle uses
    * struct_pack + CASE (map-extract semantics differ across DuckDB
    * versions, CASE is the stable equivalent).
    */
  val qFnMapStruct: Q = (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      element_at(
        map(lit("A"), lit(1L), lit("N"), lit(2L), lit("R"), lit(3L)),
        col("l_returnflag")).as("flag_code"),
      struct(col("l_quantity").as("q"), col("l_discount").as("disc"))
        .getField("q").as("struct_q"),
      struct(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
        .getField("st").as("struct_st")
    ).orderBy("l_orderkey", "l_linenumber", "flag_code", "struct_q",
              "struct_st")

  val qFnMapStructSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE l_returnflag WHEN 'A' THEN CAST(1 AS BIGINT)
      |                    WHEN 'N' THEN CAST(2 AS BIGINT)
      |                    WHEN 'R' THEN CAST(3 AS BIGINT) END AS flag_code,
      |  struct_pack(q := l_quantity, disc := l_discount).q AS struct_q,
      |  struct_pack(f := l_returnflag, st := l_linestatus).st AS struct_st
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, flag_code, struct_q,
      |  struct_st""".stripMargin

  /** JSON family — `events.props` is a JSON string (FIXTURES.md). */
  val qFnJson: Q = (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"),
      get_json_object(col("props"), "$.missing").as("missing")
    ).orderBy("event_id")

  val qFnJsonSql: String =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS BIGINT) AS k,
      |  CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
      |  props->>'$.missing' AS missing
      |FROM events ORDER BY event_id""".stripMargin

  /** Conditional family — CASE WHEN / coalesce / nullif (reference F6
    * default-on-missing, scrape.py:568).
    */
  val qFnCond: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 300000, "high")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("low").as("tier"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_x"),
      when(col("o_orderpriority").like("1-%") ||
           col("o_orderpriority").like("2-%"), lit(1L))
        .otherwise(lit(0L)).as("is_urgent")
    ).orderBy("o_orderkey")

  val qFnCondSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 300000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid'
      |       ELSE 'low' END AS tier,
      |  COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x,
      |  CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
      |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_urgent
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Bitwise family — AND/OR/XOR, shifts, popcount, plus the mergeable
    * bitwise AGGREGATES (bit_or/bit_and/bit_xor). The aggregates are the
    * scale-relevant part: a bitmask-per-group rollup combines map-side
    * (commutative/associative), so flag-summarizing 100 TB of rows
    * shuffles one word per (group, column) — the same shape the F7 GO
    * flag decode (reference scrape.py:204-231) would need to audit flag
    * coverage over a full lake. Shift operands are bounded (`% 1024`,
    * shift 4) so neither engine can hit BIGINT overflow semantics.
    */
  val qFnBitwise: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("k_and"),
        (col("l_orderkey").bitwiseOR(col("l_suppkey"))).as("k_or"),
        (col("l_partkey").bitwiseXOR(col("l_suppkey"))).as("k_xor"),
        shiftleft(col("l_partkey") % 1024, 4).as("k_shl"),
        shiftright(col("l_orderkey"), 3).as("k_shr"),
        bit_count(col("l_orderkey")).cast("long").as("k_pop"),
        col("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum("k_and").as("sum_and"),
        sum("k_or").as("sum_or"),
        sum("k_xor").as("sum_xor"),
        sum("k_shl").as("sum_shl"),
        sum("k_shr").as("sum_shr"),
        sum("k_pop").as("sum_pop"),
        expr("bit_or(k_pop)").as("agg_or"),
        expr("bit_and(k_or)").as("agg_and"),
        expr("bit_xor(k_xor)").as("agg_xor"))
      .orderBy("l_returnflag")

  val qFnBitwiseSql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    l_orderkey & l_partkey AS k_and,
      |    l_orderkey | l_suppkey AS k_or,
      |    xor(l_partkey, l_suppkey) AS k_xor,
      |    (l_partkey % 1024) << 4 AS k_shl,
      |    l_orderkey >> 3 AS k_shr,
      |    CAST(bit_count(l_orderkey) AS BIGINT) AS k_pop
      |  FROM lineitem)
      |SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(k_and) AS BIGINT) AS sum_and,
      |  CAST(sum(k_or) AS BIGINT) AS sum_or,
      |  CAST(sum(k_xor) AS BIGINT) AS sum_xor,
      |  CAST(sum(k_shl) AS BIGINT) AS sum_shl,
      |  CAST(sum(k_shr) AS BIGINT) AS sum_shr,
      |  CAST(sum(k_pop) AS BIGINT) AS sum_pop,
      |  bit_or(k_pop) AS agg_or, bit_and(k_or) AS agg_and,
      |  bit_xor(k_xor) AS agg_xor
      |FROM b GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Regex family — extract / replace / match / extract_all, the query-
    * time face of the ETL's E3 record extraction (reference
    * extractor.py:52 pulls game ids with a regex; these are the same
    * primitives applied lake-side). Patterns stay in the ASCII subset
    * where Java regex (Spark) and RE2 (DuckDB) agree: character
    * classes, anchors, `\b` on ASCII words, a single capture group.
    *
    * At 100 TB: all four are row-local projections inside whole-stage
    * codegen — the grouped rollup is the only exchange, on a 5-row key.
    */
  val qFnRegex: Q = (s, d) => {
    val joined = Tables.orders(s, d).join(Tables.customer(s, d),
      col("o_custkey") === col("c_custkey"))
    joined
      .select(
        regexp_replace(col("o_orderpriority"), "^[0-9]-", "").as("prio_word"),
        regexp_extract(col("c_name"), "#(\\d+)$", 1).cast("long").as("cust_num"),
        col("o_orderpriority").rlike("^[12]-").cast("long").as("is_hot"),
        size(regexp_extract_all(col("c_mktsegment"), lit("[AEIOU]"), lit(0)))
          .cast("long").as("seg_vowels"))
      .groupBy("prio_word")
      .agg(
        count(lit(1)).as("n"),
        sum("cust_num").as("sum_cust"),
        sum("is_hot").as("n_hot"),
        sum("seg_vowels").as("sum_vowels"))
      .orderBy("prio_word")
  }

  val qFnRegexSql: String =
    """SELECT regexp_replace(o_orderpriority, '^[0-9]-', '') AS prio_word,
      |  count(*) AS n,
      |  CAST(sum(CAST(regexp_extract(c_name, '#(\d+)$', 1) AS BIGINT))
      |    AS BIGINT) AS sum_cust,
      |  CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[12]-')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
      |  CAST(sum(len(regexp_extract_all(c_mktsegment, '[AEIOU]')))
      |    AS BIGINT) AS sum_vowels
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Lateral explode family — `posexplode_outer` over a per-row token
    * array, then a re-aggregation by token position. The null branch
    * (docs hashed into the `n_chars % 97 = 0` stripe get a NULL array)
    * lands in bucket −1, witnessing the OUTER semantics: a plain
    * explode would silently drop those rows.
    *
    * At 100 TB: Spark's GenerateExec streams the exploded rows straight
    * into the partial aggregate — no materialized token table, one
    * exchange on the 9-value bucket key. This generate→reaggregate
    * shape is how token-position stats are computed over a corpus too
    * large to store tokenized.
    */
  val qFnExplode: Q = (s, d) => {
    val docs = Tables.documents(s, d).withColumn(
      "arr",
      when(col("n_chars") % 97 === 0, lit(null))
        .otherwise(filter(split(col("text"), " "), x => length(x) > 0)))
    docs
      .select(col("doc_id"), posexplode_outer(col("arr")))
      .groupBy(coalesce(pmod(col("pos"), lit(8)), lit(-1L)).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("col"))).as("sum_chars"),
        count_distinct(col("col")).as("n_words"))
      .orderBy("bucket")
  }

  val qFnExplodeSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS ts
      |  FROM documents WHERE n_chars % 97 <> 0
      |), pe AS (
      |  SELECT doc_id, (i - 1) % 8 AS bucket, ts[i] AS word
      |  FROM toks, UNNEST(generate_series(1, len(ts))) AS g(i)
      |  UNION ALL
      |  SELECT doc_id, -1 AS bucket, NULL AS word
      |  FROM documents WHERE n_chars % 97 = 0
      |)
      |SELECT bucket, count(*) AS n,
      |  CAST(sum(length(word)) AS BIGINT) AS sum_chars,
      |  count(DISTINCT word) AS n_words
      |FROM pe GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Error-safe expression family: `try_divide` (NULL on zero
    * denominator), `try_cast` (NULL on malformed input), and
    * `try_element_at` (NULL out of bounds) — the ANSI-mode-safe
    * surface an ingestion pipeline leans on instead of job-killing
    * exceptions. The oracle replays each with DuckDB's native
    * NULL-producing spelling (`/` on a zero denominator, TRY_CAST,
    * out-of-range list indexing). The one double sum rounds each
    * quotient to 6 dp and accumulates in DECIMAL (order-free).
    */
  val qFnTry: Q = (s, d) =>
    Tables.orders(s, d).select(
      expr("try_divide(o_totalprice, o_orderkey % 7)").as("dv"),
      expr("try_cast(substring(o_orderpriority, 1, 1) as int)").as("pr"),
      expr("try_element_at(split(o_orderpriority, '-'), 5)").as("el"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("dv").isNull, 1L).otherwise(0L)).as("div_nulls"),
        sum(round(col("dv"), 6).cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))
          .cast("double").as("div_sum"),
        sum(col("pr")).as("prio_sum"),
        sum(when(col("pr").isNull, 1L).otherwise(0L)).as("cast_nulls"),
        sum(when(col("el").isNull, 1L).otherwise(0L)).as("elem_nulls"))

  val qFnTrySql: String =
    """WITH t AS (
      |  SELECT o_totalprice / NULLIF(o_orderkey % 7, 0) AS dv,
      |    TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS pr,
      |    string_split(o_orderpriority, '-')[5] AS el
      |  FROM orders)
      |SELECT count(*) AS n_rows,
      |  CAST(sum(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS div_nulls,
      |  CAST(sum(CAST(ROUND(dv, 6) AS DECIMAL(38,6))) AS DOUBLE)
      |    AS div_sum,
      |  CAST(sum(pr) AS BIGINT) AS prio_sum,
      |  CAST(sum(CASE WHEN pr IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS cast_nulls,
      |  CAST(sum(CASE WHEN el IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS elem_nulls
      |FROM t""".stripMargin

  val entries: Map[String, Q] = Map(
    "q_fn_try"        -> qFnTry,
    "q_fn_regex"      -> qFnRegex,
    "q_fn_explode"    -> qFnExplode,
    "q_fn_bitwise"    -> qFnBitwise,
    "q_fn_string"     -> qFnString,
    "q_fn_date"       -> qFnDate,
    "q_fn_math"       -> qFnMath,
    "q_fn_array"      -> qFnArray,
    "q_fn_map_struct" -> qFnMapStruct,
    "q_fn_json"       -> qFnJson,
    "q_fn_cond"       -> qFnCond
  )

  val oracles: Map[String, String] = Map(
    "q_fn_try"        -> qFnTrySql,
    "q_fn_regex"      -> qFnRegexSql,
    "q_fn_explode"    -> qFnExplodeSql,
    "q_fn_bitwise"    -> qFnBitwiseSql,
    "q_fn_string"     -> qFnStringSql,
    "q_fn_date"       -> qFnDateSql,
    "q_fn_math"       -> qFnMathSql,
    "q_fn_array"      -> qFnArraySql,
    "q_fn_map_struct" -> qFnMapStructSql,
    "q_fn_json"       -> qFnJsonSql,
    "q_fn_cond"       -> qFnCondSql
  )
}

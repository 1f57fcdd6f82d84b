package graft.etl

import java.nio.charset.StandardCharsets
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.ParsedGame

/** Distributed mjlog ETL (reference E6–E13, main.py:18-33 +
  * scrape.py:612-668), Spark-first:
  *
  *   binaryFile scan (`<dir>/<YYYYMMDD>/<game_id>.xml`)
  *     → per-file parse in executors (Dataset[ParsedGame])
  *     → deterministic kyoku-id assignment (one narrow shuffle)
  *     → 9 projections → partitioned parquet (`table/dt=YYYY-MM-DD/`)
  *
  * Scale design: parsing is embarrassingly parallel per file; the only
  * shuffle is the id window, partitioned by dt (days are independent —
  * at 100 TB each dt partition is its own window task set, and the
  * pathological single-day case is bounded by the reference's own
  * 100k-kyoku/day id space). The parsed Dataset is cached once and
  * projected 9 times — Spark's replacement for the reference's 9 global
  * row buffers (E9).
  */
object Pipeline {

  val TableNames: Seq[String] = Seq(
    "games", "rules", "game_players", "game_scores", "kyokus",
    "haipais", "actions", "agaris", "nagares")

  private val DirDate = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Raw file scan: (path, content) for every xml under
    * `<logDir>/<YYYYMMDD>/`. Split out so run() can read the listing's
    * size stats (already computed by the scan's FileIndex — no second
    * listing) before choosing execution knobs.
    */
  def rawLogs(spark: SparkSession, logDir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .option("recursiveFileLookup", "true")
      .load(logDir)
      .select("path", "content")

  /** Read + parse every xml file under `<logDir>/<YYYYMMDD>/`. */
  def parseLogs(spark: SparkSession, logDir: String): Dataset[ParsedGame] =
    parseRaw(spark, rawLogs(spark, logDir))

  def parseRaw(spark: SparkSession, raw: DataFrame): Dataset[ParsedGame] = {
    import spark.implicits._
    // registered driver-side here, bumped in executors: skipped-file
    // counts surface in the UI instead of only in executor stderr
    val skipped = ParseMetrics.skippedFiles(spark)
    raw
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val m = "(\\d{8})/([^/]+)\\.xml$".r.findFirstMatchIn(path)
        m.flatMap { mm =>
          val dt = LocalDate.parse(mm.group(1), DirDate)
          // lenient per-file failure: at scale one corrupt log must not
          // kill the job — skip it and keep the task alive. (The
          // reference aborts the whole run on the first bad file.)
          try Some(MjlogParser.parse(new String(bytes, StandardCharsets.UTF_8),
                                     mm.group(2), dt))
          catch {
            case e: Exception =>
              skipped.add(1L)
              LenientParse.warnSkip("graft-etl", path, e)
              None
          }
        }
      }
  }

  /** The 9 normalized tables from a parsed game Dataset. Kyoku ids follow
    * the reference's `days_since_epoch*100000 + seq` scheme
    * (scrape.py:447) but with a deterministic order (game_id, INIT index)
    * instead of directory iteration order (SURVEY.md §7.4.1).
    */
  /** Deterministic kyoku ids: one shuffle, partitioned by dt. Exposed so
    * run() can cache it — five tables derive from it.
    */
  def kyokusBase(parsed: Dataset[ParsedGame]): DataFrame = {
    val w = Window.partitionBy(col("dt")).orderBy(col("game_id"), col("k.idx"))
    parsed.toDF()
      .select(col("game_id"), col("dt"), explode(col("kyokus")).as("k"))
      .withColumn("id",
        (datediff(col("dt"), to_date(lit("1970-01-01"))).cast("long") * 100000L) +
          row_number().over(w) - 1)
  }

  def tables(spark: SparkSession, parsed: Dataset[ParsedGame]): Map[String, DataFrame] =
    tables(parsed, kyokusBase(parsed))

  def tables(parsed: Dataset[ParsedGame], kyokusBase: DataFrame): Map[String, DataFrame] = {
    val games = parsed.toDF()
      .select(col("game_id").as("id"), col("tonpu"), col("ariari"),
              col("sanma"), col("demo"), col("soku"), col("has_aka"),
              col("level"), col("dt").as("started_at"), col("dt"))

    val rules = parsed.toDF()
      .where(col("rule").isNotNull)
      .select(col("game_id"), col("rule.*"), col("dt"))

    val gamePlayers = parsed.toDF()
      .select(col("game_id"), posexplode(col("players")), col("dt"))
      .select(col("game_id"), col("col").as("player_name"),
              col("pos").as("player_index"), col("dt"))

    val gameScores = parsed.toDF()
      .select(col("game_id"), explode(col("game_scores")).as("s"), col("dt"))
      .select(col("game_id"), col("s.player_index"), col("s.score"),
              col("s.point").cast(DecimalType(4, 1)).as("point"), col("dt"))

    val kyokus = kyokusBase.select(
      col("id"), col("game_id"), col("k.kyoku_num"), col("k.honba"),
      col("k.reachbou"), col("k.scores"), col("k.kazes"), col("dt"))

    def child(field: String, cols: Seq[String]): DataFrame =
      kyokusBase
        .select(col("id").as("kyoku_id"), explode(col(s"k.$field")).as("c"), col("dt"))
        .select(col("kyoku_id") +: cols.map(c => col(s"c.$c")) :+ col("dt"): _*)

    Map(
      "games" -> games,
      "rules" -> rules,
      "game_players" -> gamePlayers,
      "game_scores" -> gameScores,
      "kyokus" -> kyokus,
      "haipais" -> child("haipais", Seq("player_index", "haipai", "pai_ids")),
      "actions" -> child("actions", Seq("player_index", "seq", "type", "pais", "pai_id")),
      "agaris" -> child("agaris", Seq("machipai", "score", "fu", "han", "tehai",
        "pai_ids", "yaku", "dora", "uradora", "dora_orig", "uradora_orig",
        "who", "by", "score_diff", "owari", "nukidora")),
      "nagares" -> child("nagares", Seq("name", "score_diff"))
    )
  }

  /** Full ETL: logDir → 9 Hive-partitioned parquet table dirs
    * (`<outDir>/<table>/dt=YYYY-MM-DD/...`, reference layout E11).
    */
  def run(spark: SparkSession, logDir: String, outDir: String): Unit =
    runImpl(spark, outDir) {
      val raw = rawLogs(spark, logDir)
      // Small-batch fast path: whole-stage codegen costs ~100-300 ms of
      // Janino compilation per distinct plan — across the scan, window
      // and 9 write plans that is seconds of fixed cost, which a
      // KB-scale corpus never earns back. Interpreted mode wins below
      // ~32 MB; at real volume codegen pays for itself within one task.
      // The size comes from the scan's own FileIndex stats (no extra
      // listing).
      val smallInput =
        raw.queryExecution.optimizedPlan.stats.sizeInBytes < (32L << 20)
      (parseRaw(spark, raw), smallInput)
    }

  /** The same ETL sourced through the `mjlog` DataSource V2 instead of
    * the binaryFile scan + typed flatMap: one InputPartition per file,
    * identical downstream plan. Measured as its own THROUGHPUT row so
    * the V2 path is held to the typed path's wall time.
    */
  def runV2(spark: SparkSession, logDir: String, outDir: String): Unit =
    runImpl(spark, outDir) {
      import spark.implicits._
      // no FileIndex size stats on the V2 relation; the measured corpora
      // are all ≥ 32 MB so the small-batch interpreted mode never applies
      (spark.read.format("mjlog").load(logDir).as[ParsedGame], false)
    }

  private def runImpl(spark: SparkSession, outDir: String)
                     (source: => (Dataset[ParsedGame], Boolean)): Unit = {
    // dynamic partition overwrite: re-running one date's logs replaces
    // only that date's dt= partitions — the idempotent per-date re-run
    // the reference gets by rewriting whole files (E13), without
    // touching unrelated days.
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // mjlogs are KB-sized: the default 4 MB open-cost estimate would
    // fragment the scan into one task per handful of files. The floor
    // keeps small corpora parallel — with the 64k estimate alone, a
    // 14 MB / 2000-file corpus bin-packs into 1-2 scan tasks and the
    // parse serializes onto 1-2 of the 32 cores
    spark.conf.set("spark.sql.files.openCostInBytes", (64 * 1024).toString)
    // pack-granularity knobs, overridable for ops tuning and the
    // THROUGHPUT.md bin-pack experiments: minPartitionNum drives
    // bytesPerCore in the split policy (both the binaryFile scan and
    // the mjlog DSv2 packer honor it), so raising it shrinks packs —
    // more, smaller scan tasks to absorb per-file parse-cost variance
    spark.conf.set("spark.sql.files.minPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_MINPARTS",
        (spark.sparkContext.defaultParallelism * 2).toString))
    sys.env.get("SPARK_GRAFT_MAXPART").foreach(v =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    val (parsedSource, smallInput) = source
    val prevCodegen = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    if (smallInput) {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    }
    // ONE dt-clustering shuffle for the whole pipeline: the id window
    // (partitionBy dt) reuses this partitioning instead of shuffling
    // again, and every projection stays narrow, so all 9 partitioned
    // writes inherit dt-clustered tasks (1 file per dt dir) with no
    // per-write repartition. At 100 TB: repartition(col("dt"),
    // col("game_id")) to spread a day over N tasks/files.
    val parsed = parsedSource
      .repartition(col("dt")).cache()
    // the window-ranked kyoku intermediate feeds 5 of the 9 tables —
    // cache it so the explode+window runs once, not five times
    val kb = kyokusBase(parsed).cache()
    try {
      // materialize both caches BEFORE forking the 9 writes: concurrent
      // jobs racing an unbuilt cache each recompute the partitions they
      // find missing (Spark dedups shuffle map stages across jobs, but
      // not cache-partition builds), so the scan+parse ran up to 10×.
      // Measured at 1.4 GB / 200k logs: the V2-sourced pipeline dropped
      // 157 s → ~55 s from these two counts; typed moved within noise.
      def phase[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[etl] phase $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      phase("parse+cache")(parsed.count())
      phase("kyoku ids+cache")(kb.count())
      val dts = tables(parsed, kb)
      // the 9 writes are independent jobs over cached inputs — submit
      // them concurrently so wall time is max(job), not sum(job)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      phase("9 table writes") {
        val jobs = TableNames.map { name =>
          Future {
            dts(name)
              .withColumn("dt", date_format(col("dt"), "yyyy-MM-dd"))
              // no repartition here: tasks are already dt-clustered by the
              // single upstream shuffle, so each dt= dir gets one file and
              // the commit protocol stays off the profile
              .write.mode("overwrite").partitionBy("dt")
              .parquet(s"$outDir/$name")
          }
        }
        jobs.foreach(Await.result(_, Duration.Inf))
      }
    } finally {
      parsed.unpersist()
      kb.unpersist()
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(key, x)
        case None    => spark.conf.unset(key)
      }
      restore("spark.sql.sources.partitionOverwriteMode", prev)
      if (smallInput) {
        restore("spark.sql.codegen.wholeStage", prevCodegen)
        restore("spark.sql.codegen.factoryMode", prevFactory)
      }
    }
  }
}

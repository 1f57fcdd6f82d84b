package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import util._

/** A streaming event row for MemoryStream-driven semantics checks. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Per-key session accumulator for the stateful op. */
case class KeyCount(user_id: Long, n: Long, total: Double)

/** transformWithState processor: running count/total per user with an
  * explicit ValueState handle.
  */
class RunningCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, KeyCount] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.streaming.ValueState
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var state: ValueState[KeyCount] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[KeyCount](
      "running", Encoders.product[KeyCount], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timers: TimerValues): Iterator[KeyCount] = {
    val prev = if (state.exists()) state.get() else KeyCount(key, 0L, 0.0)
    val batch = rows.toSeq
    val next = KeyCount(key, prev.n + batch.size,
                        prev.total + batch.map(_.value).sum)
    state.update(next)
    Iterator.single(next)
  }
}

/** Structured Streaming surface (SURVEY.md §2.3). The reference's analog
  * is the daily incremental append (E13): each date directory is a
  * micro-batch. Window aggregations are verified two ways:
  *  - tumbling/sliding/session run as *batch* queries over `events` with
  *    a DuckDB oracle (windowing semantics are identical in batch);
  *  - watermark/late-data/dedup/stateful semantics run on a real
  *    MemoryStream with hand-placed late rows (deterministic, no oracle).
  *
  * Scale notes: streaming state (watermark windows, dedup keys, session
  * state) is per-key in the state store — at 100 TB/day the keys shard
  * across executors by groupBy hash; watermarks bound state size, and
  * `dropDuplicatesWithinWatermark` exists precisely so the dedup state
  * doesn't grow unboundedly.
  */
object StreamingQ {

  /** Tumbling 1-hour windows per event type (batch-equivalent). */
  val qStreamTumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"),
              col("sum_value"))
      .orderBy("wstart", "event_type")

  val qStreamTumblingSql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart, event_type,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** Sliding 1-hour windows every 15 minutes — each event lands in 4
    * windows. Oracle reproduces the window-start arithmetic directly.
    */
  val qStreamSliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("wstart"), col("cnt"), col("sum_value"))
      .orderBy("wstart")

  val qStreamSlidingSql: String =
    """WITH slid AS (
      |  SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - k.o) * 900)
      |              AS TIMESTAMP) AS wstart,
      |         value
      |  FROM events, (VALUES (0), (1), (2), (3)) k(o)
      |)
      |SELECT wstart, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM slid GROUP BY wstart ORDER BY wstart""".stripMargin

  /** Session windows (30-minute gap) per user — batch session_window with
    * a lag/running-sum sessionization oracle (identical semantics: a new
    * session starts when the gap exceeds 30 minutes).
    */
  val qStreamSession: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"), col("cnt"),
              col("sum_value"))
      .orderBy("user_id", "session_start")

  val qStreamSessionSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
      |), flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
      |         ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), sess AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ------------------------------------------------- true-stream checks

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(t), user, typ, v)

  /** Deterministic hand-placed batches: on-time rows, a late-but-within-
    * watermark row, a too-late row, and a final watermark-advancing row.
    */
  private val batch1 = Seq(
    ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
    ev(2, "2024-01-01 10:20:00", 1, "click", 2.0),
    ev(3, "2024-01-01 11:10:00", 2, "view", 3.0))
  private val batch2 = Seq(
    ev(4, "2024-01-01 11:08:00", 1, "click", 4.0),  // late, within 10-min wm
    ev(5, "2024-01-01 12:30:00", 2, "view", 5.0))   // advances wm past 11:00
  private val batch3 = Seq(
    ev(6, "2024-01-01 10:30:00", 1, "click", 99.0), // too late — dropped
    ev(7, "2024-01-01 14:30:00", 2, "view", 6.0))   // advances wm past 12:xx

  private def runMemoryStream(s: SparkSession, name: String)
                             (build: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // state-store partition count follows shuffle partitions at query
    // start; 3 hand-placed batches don't need 32 state stores — shrink
    // for the semantics check, restore after (production streams size
    // this to key cardinality, not to this fixture).
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val ms = MemoryStream[Ev]
      // checkpoint (offset/commit logs, state snapshots) on tmpfs when
      // available: each micro-batch fsyncs the logs, and for a 3-batch
      // semantics check those fsyncs dominate wall time. Real deployments
      // point this at durable storage — the fixture needs determinism,
      // not durability.
      val ckptBase =
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          java.nio.file.Paths.get("/dev/shm")
        else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
      val ckpt = java.nio.file.Files
        .createTempDirectory(ckptBase, s"graft_ckpt_${name}_")
      val q = build(ms.toDF())
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append).start()
      try {
        Seq(batch1, batch2, batch3).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally {
        q.stop()
        // the memory-sink table keeps the results; the checkpoint is scrap
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } catch { case _: Exception => }
      }
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(name)
  }

  /** Watermark + tumbling window in append mode: only windows the
    * watermark has passed are emitted; the too-late row (id 6) is
    * dropped, the late-but-in-watermark row (id 4) is counted.
    */
  val qStreamWatermark: Q = (s, _) =>
    runMemoryStream(s, "graft_stream_wm") { df =>
      df.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("cnt"),
                col("sum_value"))
    }.orderBy("wstart", "event_type")

  /** Streaming dedup by event_id within the watermark. */
  val qStreamDedup: Q = (s, _) =>
    runMemoryStream(s, "graft_stream_dedup") { df =>
      df.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .select("event_id", "user_id", "event_type", "value")
    }.orderBy("event_id")

  /** Per-key running state via flatMapGroupsWithState — the streaming
    * form of the reference's sequential event fold (E8, scrape.py:355-609):
    * state scoped to a key, updated per batch, emitted on change.
    */
  val qStreamStateful: Q = (s, _) => {
    import s.implicits._
    val fn: (Long, Iterator[Ev], GroupState[KeyCount]) => Iterator[KeyCount] =
      (user, rows, state) => {
        val prev = state.getOption.getOrElse(KeyCount(user, 0L, 0.0))
        val batch = rows.toSeq
        val next = KeyCount(user, prev.n + batch.size,
                            prev.total + batch.map(_.value).sum)
        state.update(next)
        Iterator(next)
      }
    runMemoryStream(s, "graft_stream_state") { df =>
      df.as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append,
                                GroupStateTimeout.NoTimeout)(fn)
        .toDF()
    }.orderBy("user_id", "n")
  }

  /** The same per-key running state through Spark 4's transformWithState
    * (the successor API, SURVEY.md §7.4.7): explicit ValueState handle,
    * RocksDB state store (required by the API; the production-scale
    * store anyway). Emits the same rows as the flatMapGroupsWithState
    * form — asserted in StreamingSpec.
    */
  val qStreamStatefulTws: Q = (s, _) => {
    import s.implicits._
    val prevProvider =
      s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      runMemoryStream(s, "graft_stream_tws") { df =>
        df.as[Ev]
          .groupByKey(_.user_id)
          .transformWithState(new RunningCountProcessor(),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append)
          .toDF()
      }
    } finally prevProvider match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }.orderBy("user_id", "n")

  val entries: Map[String, Q] = Map(
    "q_stream_stateful_tws" -> qStreamStatefulTws,
    "q_stream_tumbling"  -> qStreamTumbling,
    "q_stream_sliding"   -> qStreamSliding,
    "q_stream_session"   -> qStreamSession,
    "q_stream_watermark" -> qStreamWatermark,
    "q_stream_dedup"     -> qStreamDedup,
    "q_stream_stateful"  -> qStreamStateful
  )

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" -> qStreamTumblingSql,
    "q_stream_sliding"  -> qStreamSlidingSql,
    "q_stream_session"  -> qStreamSessionSql
  )
}

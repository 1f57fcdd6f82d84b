package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Micro-batch streaming over the `mjlog` DSv2
  * (graft.sources.MjlogMicroBatchStream): the reference's E6 directory
  * scan + E13 per-date incremental flush as
  * `spark.readStream.format("mjlog")`. Covers incremental discovery,
  * the max-path offset contract, checkpoint resume (no re-delivery of
  * committed games), and dt filtering on the stream (applied above the
  * scan — Spark's streaming planner runs no V2 filter pushdown).
  */
class MjlogStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val fixtures = java.nio.file.Paths.get(
    getClass.getResource("/mjlog").getPath)

  /** Copy one fixture day dir into the growing stream dir. */
  private def addDay(streamDir: Path, day: String): Unit = {
    val src = fixtures.resolve(day)
    val dst = streamDir.resolve(day)
    Files.createDirectories(dst)
    Files.list(src).iterator().asScala.foreach { f =>
      Files.copy(f, dst.resolve(f.getFileName.toString),
                 StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("incremental discovery, exactly-once across restart, dt pruning") {
    val dir = Files.createTempDirectory("mjlog-stream")
    val ckpt = Files.createTempDirectory("mjlog-stream-ckpt")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()

    def startQuery() = spark.readStream.format("mjlog")
      .load(dir.toString)
      .select("game_id")
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.collect().foreach(r => seen.add(id -> r.getString(0)))
      }
      .start()

    // day 1: two games
    addDay(dir, "20240101")
    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(seen.asScala.map(_._2).toSet ==
        Set("2024010100gm-0001", "2024010101gm-0002"))

      // day 2 arrives: only the new game is delivered, in a later batch
      addDay(dir, "20240102")
      q.processAllAvailable()
      val byBatch = seen.asScala.toSeq.groupBy(_._1)
      assert(seen.asScala.map(_._2).toSet ==
        Set("2024010100gm-0001", "2024010101gm-0002", "2024010200gm-0003"))
      assert(byBatch.values.count(_.nonEmpty) >= 2,
        "day 2 must arrive in a batch after day 1's")
    } finally q.stop()

    // restart from the checkpoint: day 3 arrives while down; only day 3
    // is delivered (committed watermark skips days 1-2)
    addDay(dir, "20240103")
    seen.clear()
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(seen.asScala.map(_._2).toSeq == Seq("2024010300gm-0004"),
        "restart must resume from the committed offset, not re-deliver")
    } finally q2.stop()

    // admission control: maxFilesPerTrigger=1 over the 4 accumulated
    // files must deliver them one per micro-batch, in path (= scrape)
    // order — the bounded-backfill behavior a restart against a year of
    // logs needs at scale
    val ckptMax = Files.createTempDirectory("mjlog-stream-ckpt-max")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[String])]()
    val qMax = spark.readStream.format("mjlog")
      .option("maxFilesPerTrigger", "1")
      .load(dir.toString)
      .select("game_id")
      .writeStream
      .option("checkpointLocation", ckptMax.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add(id -> df.collect().map(_.getString(0)).toSeq); ()
      }
      .start()
    try {
      qMax.processAllAvailable()
      val nonEmpty = batches.asScala.toSeq.sortBy(_._1).map(_._2).filter(_.nonEmpty)
      assert(nonEmpty == Seq(
        Seq("2024010100gm-0001"), Seq("2024010101gm-0002"),
        Seq("2024010200gm-0003"), Seq("2024010300gm-0004")),
        s"one file per trigger in path order, got $nonEmpty")
    } finally qMax.stop()

    // Trigger.AvailableNow + admission control: drain the whole backlog
    // in bounded batches, then terminate on its own — the managed
    // backfill shape (Spark wraps the stream in its AvailableNow
    // wrapper, which must respect our ReadMaxFiles watermark stepping)
    val ckptAn = Files.createTempDirectory("mjlog-stream-ckpt-an")
    val anBatches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val qAn = spark.readStream.format("mjlog")
      .option("maxFilesPerTrigger", "2")
      .load(dir.toString)
      .select("game_id")
      .writeStream
      .option("checkpointLocation", ckptAn.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        anBatches.add(df.count().toInt); ()
      }
      .start()
    assert(qAn.awaitTermination(120000), "AvailableNow query must self-terminate")
    val counts = anBatches.asScala.toSeq.filter(_ > 0)
    assert(counts.sum == 4, s"backlog of 4 games fully drained, got $counts")
    assert(counts.forall(_ <= 2), s"batches bounded by maxFilesPerTrigger=2, got $counts")
    assert(counts.size >= 2, s"backlog must split into multiple batches, got $counts")

    // dt filter prunes day dirs from the stream's output
    val ckpt2 = Files.createTempDirectory("mjlog-stream-ckpt2")
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q3 = spark.readStream.format("mjlog")
      .load(dir.toString)
      .where(col("dt") === lit(java.sql.Date.valueOf("2024-01-02")))
      .select("game_id")
      .writeStream
      .option("checkpointLocation", ckpt2.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen2.add(r.getString(0)))
      }
      .start()
    try {
      q3.processAllAvailable()
      assert(seen2.asScala.toSeq == Seq("2024010200gm-0003"))
    } finally q3.stop()
  }

  test("watermark-pruned incremental listing, one listing per trigger, " +
       "backfill surfaced in a counter") {
    import graft.sources.MjlogListing
    val dir = Files.createTempDirectory("mjlog-prune")
    val seedXml = fixtures.resolve("20240101").resolve("2024010100gm-0001.xml")
    def plant(day: String, id: String): Unit = {
      val d = dir.resolve(day)
      Files.createDirectories(d)
      Files.copy(seedXml, d.resolve(s"$id.xml"),
                 StandardCopyOption.REPLACE_EXISTING)
    }
    val days = Seq("20240101", "20240102", "20240103", "20240104")
    days.zipWithIndex.foreach { case (day, i) => plant(day, s"${day}00gm-100$i") }

    // AvailableNow drain, one file per trigger, over the 4-day backlog:
    // the listing probe must show ONE listing per trigger (latestOffset
    // and planInputPartitions share it) with the dir count SHRINKING as
    // the committed watermark's day advances — the anti-listing-storm
    // contract a year-long backfill needs.
    MjlogListing.listingProbe.clear()
    val ckpt = Files.createTempDirectory("mjlog-prune-ckpt")
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("mjlog")
      .option("maxFilesPerTrigger", "1")
      .load(dir.toString)
      .select("game_id")
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => delivered.add(r.getString(0))); ()
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(delivered.asScala.toSet == days.zipWithIndex
      .map { case (d, i) => s"${d}00gm-100$i" }.toSet)
    val listings = MjlogListing.listingProbe.asScala.toSeq
    // the AvailableNow seed lists the full tree: root + 4 day dirs
    assert(listings.head == 5, s"seed must list the full tree, got $listings")
    // one shared listing per trigger: seed + at most one per trigger
    // (4 data triggers + a possible final idle one). Unshared would be ~9.
    assert(listings.size <= 6, s"expected one listing per trigger, got $listings")
    // day dirs strictly below the watermark's day are never re-listed
    assert(listings.zip(listings.tail).forall { case (a, b) => b <= a },
      s"listing size must shrink as the watermark advances, got $listings")
    assert(listings.last <= 3,
      s"day dirs below the watermark must be pruned, got $listings")

    // Backfill below the committed watermark: skipped by design, but the
    // skip must be OBSERVABLE (graft.mjlog.backfilledFiles) — a silent
    // exactly-once violation is an operator's nightmare at 100 TB.
    val acc = graft.etl.ParseMetrics.backfilledFiles(spark)
    val before = acc.value
    val ckpt2 = Files.createTempDirectory("mjlog-prune-ckpt2")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = spark.readStream.format("mjlog")
      .load(dir.toString)
      .select("game_id")
      .writeStream
      .option("checkpointLocation", ckpt2.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add(r.getString(0))); ()
      }
      .start()
    try {
      q2.processAllAvailable() // establishes the below-watermark baseline
      // lands below the watermark ("...gm-0000" < "...gm-1003"): never
      // delivered, but counted; the second file is a legit append we can
      // sync on
      plant("20240104", "2024010400gm-0000")
      plant("20240104", "2024010400gm-9999")
      q2.processAllAvailable()
      assert(seen.asScala.toSeq.contains("2024010400gm-9999"),
        "appends above the watermark still flow")
      assert(!seen.asScala.toSeq.contains("2024010400gm-0000"),
        "a backfill below the watermark is skipped by contract")
      val deadline = System.currentTimeMillis + 30000
      while (acc.value < before + 1 && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(acc.value >= before + 1,
        "the skipped backfill must surface in graft.mjlog.backfilledFiles")
    } finally q2.stop()
  }
}

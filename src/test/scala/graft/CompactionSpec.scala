package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Physical half of `q_sink_compact` (the gate oracle proves content
  * losslessness; this proves the compaction actually compacted): the
  * fragmented seed layout holds many files per month directory, the
  * compacted copy exactly one.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def parquetCountsPerDir(root: String): Map[String, Int] =
    Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("month="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))
      }.toMap

  test("compaction rewrites every month directory down to one file") {
    val out = Relational.entries("q_sink_compact")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val frag = parquetCountsPerDir(Relational.scratchDir("compact_frag", sfDir))
    val tidy = parquetCountsPerDir(Relational.scratchDir("compact_tidy", sfDir))
    assert(frag.keySet == tidy.keySet, "compaction must keep every partition")
    assert(frag.values.max > 1,
      s"seed layout must be fragmented, got $frag")
    assert(tidy.values.forall(_ == 1),
      s"every compacted partition must hold exactly one file, got $tidy")
    // row counts per month survive (cheap content cross-check; the
    // DuckDB oracle does the full hash compare at the gate)
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sfDir).count())
  }
}

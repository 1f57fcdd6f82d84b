package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.MjlogParser
import graft.model.ParsedGame

/** DataSource V2 for the Tenhou mjlog XML format — the reference's E6+E7
  * (directory scan + XML parse, extractor.py:64 / main.py) exposed the
  * way a Spark user expects a source: `spark.read.format("mjlog")
  * .load(dir)` yields one nested row per game (the [[ParsedGame]]
  * schema), from which `Pipeline.tables` demuxes the 9 reference tables.
  *
  * Scale design:
  *  - one [[InputPartition]] per xml file — a game parses in one task
  *    with no cross-row state (SURVEY.md §7.4), so parallelism equals
  *    file count and a 1000-executor cluster streams a day's scrape
  *    without coordination;
  *  - file listing runs once on the driver through the Hadoop
  *    FileSystem API, so the same code reads local disk, HDFS, or any
  *    object store with a Hadoop connector;
  *  - column pruning is pushed into the reader
  *    ([[SupportsPushDownRequiredColumns]]): parse is all-or-nothing,
  *    but the per-row projection drops unused (potentially deeply
  *    nested) columns BEFORE rows cross the task boundary, so
  *    `select(game_id)` ships ids, not full games.
  */
class MjlogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mjlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MjlogTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new MjlogTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("mjlog source requires a path")))
  override def supportsExternalMetadata(): Boolean = false
}

object MjlogTable {
  /** Row schema = the ParsedGame encoder's schema (single source of
    * truth with the typed ETL path).
    */
  val Schema: StructType = ExpressionEncoder[ParsedGame]().schema

  private val DirDate = DateTimeFormatter.ofPattern("yyyyMMdd")
  private val FileRe = "(\\d{8})/([^/]+)\\.xml$".r

  /** (dt, game_id) from `<YYYYMMDD>/<id>.xml`, as in Pipeline.parseRaw. */
  def parseName(path: String): Option[(LocalDate, String)] =
    FileRe.findFirstMatchIn(path).map { m =>
      (LocalDate.parse(m.group(1), DirDate), m.group(2))
    }

  /** Filter-literal → epoch day, whichever date representation Spark
    * hands down (java.sql.Date by default, LocalDate under the java8
    * datetime API).
    */
  def literalEpochDay(v: Any): Option[Long] = v match {
    case d: java.sql.Date      => Some(d.toLocalDate.toEpochDay)
    case d: LocalDate          => Some(d.toEpochDay)
    case _                     => None
  }

  /** A source filter this scan can evaluate from the path alone: a
    * comparison on the `dt` column against date literals. (Top-level
    * AND is already split by Spark before pushFilters.)
    */
  def isDtPrunable(f: Filter): Boolean = f match {
    case EqualTo("dt", v)            => literalEpochDay(v).isDefined
    case GreaterThan("dt", v)        => literalEpochDay(v).isDefined
    case GreaterThanOrEqual("dt", v) => literalEpochDay(v).isDefined
    case LessThan("dt", v)           => literalEpochDay(v).isDefined
    case LessThanOrEqual("dt", v)    => literalEpochDay(v).isDefined
    case In("dt", vs)                => vs.nonEmpty && vs.forall(v => literalEpochDay(v).isDefined)
    case _                           => false
  }

  /** Evaluate a prunable filter against one file's path-derived dt. */
  def dtSatisfies(epochDay: Long, f: Filter): Boolean = f match {
    case EqualTo("dt", v)            => literalEpochDay(v).contains(epochDay)
    case GreaterThan("dt", v)        => literalEpochDay(v).exists(epochDay > _)
    case GreaterThanOrEqual("dt", v) => literalEpochDay(v).exists(epochDay >= _)
    case LessThan("dt", v)           => literalEpochDay(v).exists(epochDay < _)
    case LessThanOrEqual("dt", v)    => literalEpochDay(v).exists(epochDay <= _)
    case In("dt", vs)                => vs.exists(v => literalEpochDay(v).contains(epochDay))
    case _                           => true
  }
}

class MjlogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"mjlog:`$path`"
  override def schema(): StructType = MjlogTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MjlogScanBuilder(path)
}

class MjlogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = MjlogTable.Schema
  private var dtFilters: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // honor pruning at the TOP level only: Spark may hand back nested
    // structs with fields removed (schema pruning), but the parser
    // materializes whole games, so we keep each selected column's full
    // type and let Spark's retained Project trim nested fields above
    // the scan — best-effort pruning is the documented contract
    required = StructType(
      requiredSchema.fieldNames.map(n => MjlogTable.Schema(n)))
  // dt is path-derived (reference E4: date-prefix filter at LISTING
  // time, extractor.py:33-40), so dt comparisons prune InputPartitions
  // before they are created — a `.where($"dt" === d)` over a year of
  // logs lists one day, not 365. All filters are returned as residual:
  // pruning is a partition-elimination optimization, Spark re-checks
  // rows above the scan (free at one game per file).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    dtFilters = filters.filter(MjlogTable.isDtPrunable)
    filters
  }
  override def pushedFilters(): Array[Filter] = dtFilters
  override def build(): Scan = new MjlogScan(path, required, dtFilters)
}

case class MjlogFilePartition(file: String, dtEpochDay: Long, gameId: String)
    extends InputPartition

class MjlogScan(path: String, required: StructType,
                dtFilters: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surface the listing-time pruning in `.explain()`: BatchScan prints
  // the scan's description, so the pushed dt filters are visible in the
  // plan the same way FileSourceScanExec prints PushedFilters
  override def description(): String =
    s"mjlog $path, PushedFilters: ${dtFilters.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    val out = Array.newBuilder[InputPartition]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toString
      if (p.endsWith(".xml")) MjlogTable.parseName(p).foreach { case (dt, id) =>
        val ed = dt.toEpochDay
        if (dtFilters.forall(MjlogTable.dtSatisfies(ed, _)))
          out += MjlogFilePartition(p, ed, id)
      }
    }
    out.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val session = org.apache.spark.sql.SparkSession.active
    val conf = new org.apache.spark.util.SerializableConfiguration(
      session.sparkContext.hadoopConfiguration)
    // same skip counter as the typed path (graft.etl.ParseMetrics):
    // registered driver-side, bumped in executors, visible in the UI
    new MjlogReaderFactory(required, conf,
      graft.etl.ParseMetrics.skippedFiles(session))
  }
}

class MjlogReaderFactory(
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    skipped: org.apache.spark.util.LongAccumulator)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MjlogFilePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        done = true
        val hp = new HPath(p.file)
        val fs = hp.getFileSystem(conf.value)
        val out = new java.io.ByteArrayOutputStream()
        val in = fs.open(hp)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        finally in.close()
        val xml = out.toString(java.nio.charset.StandardCharsets.UTF_8)
        // same per-file leniency as Pipeline.parseRaw: one corrupt log
        // skips (zero rows for this partition), it must not kill the job
        val game: ParsedGame =
          try MjlogParser.parse(xml, p.gameId, LocalDate.ofEpochDay(p.dtEpochDay))
          catch {
            case e: Exception =>
              skipped.add(1L)
              graft.etl.LenientParse.warnSkip("graft-mjlog", p.file, e)
              return false
          }
        val full = ExpressionEncoder[ParsedGame]().createSerializer()(game)
        // prune to the pushed-down columns: bind each required field to
        // its ordinal in the full row and project once
        val fullSchema = MjlogTable.Schema
        val refs = required.fields.map { f =>
          val i = fullSchema.fieldIndex(f.name)
          BoundReference(i, fullSchema(i).dataType, fullSchema(i).nullable)
        }
        row = UnsafeProjection.create(refs.toSeq).apply(full).copy()
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

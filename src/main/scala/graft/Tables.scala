package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (see /root/repo/TESTDATA.md).
  *
  * Design notes for 100 TB scale: every loader is a plain parquet scan so
  * Catalyst's `FileSourceScanExec` keeps predicate pushdown / column
  * pruning / partition pruning intact. At production scale these paths
  * would point at a `dt=`-partitioned lake (reference layout:
  * scrape.py:613-622) and the same code works unchanged — partition
  * pruning is handled by the optimizer, not by the loaders.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). The
    * session must set `spark.sql.legacy.parquet.nanosAsLong=true` (done
    * in the Verify/Bench/test session builders — loaders stay
    * side-effect-free); we then truncate the long nanos to microseconds,
    * Spark's native timestamp precision. All oracle SQL that orders or
    * compares `ts` does `CAST(ts AS TIMESTAMP)` on the DuckDB side so
    * both engines see identical microsecond values.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
}

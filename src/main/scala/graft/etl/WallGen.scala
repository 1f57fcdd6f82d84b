package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic tile-wall generator (reference E14, random_pailist.py).
  *
  * Differences from the reference, by design:
  *  - deterministic: per-record RNG seeded from (seed, record id) — the
  *    reference uses an unseeded generator (random_pailist.py:32);
  *  - fully distributed: `spark.range(n)` parallelizes generation; id
  *    assignment needs no coordination because it's a pure function of
  *    the range index (same `9e11 + days*100000 + seq` scheme,
  *    random_pailist.py:45).
  */
object WallGen {
  val IdOffset: Long = 900000000000L

  /** One shuffled wall (permutation of 0–135) per id, Fisher–Yates with a
    * splitmix-style per-record seed.
    */
  def generate(spark: SparkSession, n: Long, date: LocalDate,
               seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val days = date.toEpochDay
    val base = IdOffset + days * 100000L
    spark.range(n).map { i =>
      val rng = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
      val arr = Array.range(0, 136)
      var j = arr.length - 1
      while (j > 0) {
        val k = rng.nextInt(j + 1)
        val t = arr(j); arr(j) = arr(k); arr(k) = t
        j -= 1
      }
      (base + i, arr.toSeq)
    }.toDF("id", "pai_ids")
  }

  /** Write under the reference's layout: paiyamas/dt=YYYY-MM-DD/. */
  def write(spark: SparkSession, n: Long, date: LocalDate, outDir: String,
            seed: Long = 42L): Unit =
    generate(spark, n, date, seed)
      .withColumn("dt", lit(date.toString))
      .write.mode("overwrite").partitionBy("dt")
      .parquet(s"$outDir/paiyamas")
}

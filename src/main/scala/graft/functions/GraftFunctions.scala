package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.codecs.{Melds, Tiles}

/** Query-time extension surface (SURVEY.md §2.4): scalar UDFs wrapping
  * the pure codec layer, and a typed Aggregator registered as a UDAF.
  *
  * UDFs are optimization barriers (no codegen, no pushdown through
  * them), so they exist for *rendering* at query time — the hot path
  * (ETL parse, §2.1) calls the same pure functions directly in typed
  * map tasks, and relational predicates stay built-in expressions.
  */
object GraftFunctions {

  /** Exact weighted average: decimal-exact partial sums so results are
    * engine-independent (same trick as util.dsum). Demonstrates the
    * typed Aggregator surface — partials merge associatively, so Spark
    * runs it as partial+final just like a built-in.
    */
  final case class WSum(sum: BigDecimal, weight: BigDecimal)

  class WeightedAvg extends Aggregator[(Double, Double), WSum, Double] {
    def zero: WSum = WSum(BigDecimal(0), BigDecimal(0))
    def reduce(b: WSum, a: (Double, Double)): WSum = {
      val v = BigDecimal(a._1).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val w = BigDecimal(a._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      WSum(b.sum + v * w, b.weight + w)
    }
    def merge(x: WSum, y: WSum): WSum = WSum(x.sum + y.sum, x.weight + y.weight)
    def finish(r: WSum): Double =
      // two exact decimal->double conversions + one IEEE division, so
      // the result is bit-identical to the oracle's SUM/SUM expression
      if (r.weight == 0) 0.0 else r.sum.toDouble / r.weight.toDouble
    def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Group-level MinHash signature merge: the signature of a *set* of
    * documents is the elementwise min of member signatures — letting a
    * groupBy estimate cross-cluster Jaccard without touching raw text
    * again. Null/empty inputs are identities.
    */
  class MinhashMerge extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.empty
    def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = merge2(b, a)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      merge2(x, scala.collection.immutable.ArraySeq.unsafeWrapArray(y))
    private def merge2(b: Array[Long], a: Seq[Long]): Array[Long] = {
      if (a == null || a.isEmpty) return b
      if (b.isEmpty) return a.toArray
      val out = new Array[Long](b.length)
      var i = 0
      while (i < b.length) { out(i) = math.min(b(i), a(i)); i += 1 }
      out
    }
    def finish(r: Array[Long]): Seq[Long] = r.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Bounded top-k by (score desc, id asc) as a typed Aggregator — the
    * partial-aggregation form of a distributed top-k/kNN merge. Each
    * map task reduces its scored stream to ≤k rows per group BEFORE
    * the exchange (partial ObjectHashAggregate), so the shuffle
    * carries at most k rows per (group, task) instead of the full
    * candidate fanout — the property a kNN join needs to survive a
    * candidate set that grows with the data.
    *
    * The comparator is total on (score, id) with unique ids, so
    * reduce/merge are associative+commutative and the result is
    * identical to a row_number() window over the same ordering. A NaN
    * score (e.g. cosine of a zero-norm vector) would break that
    * totality — better() answers false both ways and the sort order
    * becomes undefined — so NaN rows are dropped at insert, which is
    * also what the row_number-over-DESC oracle shape does with NULLs.
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(b: Seq[(Double, Long)],
                       a: (Double, Long)): Seq[(Double, Long)] =
      if (a._1.isNaN) b
      else if (b.length >= k && better(b.last, a)) b
      else (b :+ a).sortWith(better).take(k)
    def zero: Seq[(Double, Long)] = Seq.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      insert(b, a)
    def merge(x: Seq[(Double, Long)],
              y: Seq[(Double, Long)]): Seq[(Double, Long)] = y.foldLeft(x)(insert)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Register every graft SQL function on a session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_tiles",
      (ids: Seq[Int], hasAka: Boolean) => Tiles.numToHai(ids, hasAka))
    spark.udf.register("graft_dora",
      (ids: Seq[Int]) => Tiles.doraFromIndicators(ids))
    spark.udf.register("graft_meld_pais",
      (m: Int, hasAka: Boolean) => Melds.decode(m, hasAka).map(_.pais).orNull)
    spark.udf.register("graft_meld_type",
      (m: Int, hasAka: Boolean) => Melds.decode(m, hasAka).map(_.atype).orNull)
    spark.udf.register("graft_weighted_avg", udaf(new WeightedAvg))
    spark.udf.register("graft_minhash_merge", udaf(new MinhashMerge))
  }
}

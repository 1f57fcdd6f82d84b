package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Merge/upsert semantics: updates replace in place, inserts append,
  * untouched keys pass through byte-identical.
  */
class MergeUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("latest-wins merge: update wins, insert appends, rest unchanged") {
    val base = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val merged = Relational.qMergeUpsert(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val inserted = merged.keySet -- base.keySet
    // insert namespace = key + max(o_orderkey)+1, disjoint at any SF
    val offset = base.keySet.max + 1L
    assert(inserted.nonEmpty && inserted.forall(_ > base.keySet.max))
    assert(inserted == base.keySet.filter(_ % 97 == 0).map(_ + offset))
    assert(inserted.forall(k => merged(k)._1 == "9-NEW"))
    base.foreach { case (k, (prio, price)) =>
      if (k % 37 == 0) {
        assert(merged(k)._1 == s"U-$prio", s"key $k not updated")
        assert(merged(k)._2 == price + 1.0)
      } else {
        assert(merged(k) == ((prio, price)), s"key $k should be untouched")
      }
    }
    // exactly one row per key survives compaction
    assert(merged.size == base.size + inserted.size)
  }
}

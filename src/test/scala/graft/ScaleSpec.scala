package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wall-time scaling guard over the synthesized sf1 point (10× sf0.1;
  * `runMain graft.ScaleGen` writes it to `scratch/sf1`): the two
  * operators whose naive implementations are quadratic — the LSH
  * near-dup chain and the kNN self-join — must grow sub-quadratically
  * in MEASURED WALL TIME across the 10× step, not just in candidate
  * count (LlmOpsSpec's work-growth assert covers that separately).
  *
  * Threshold: ×15 for 10× data — SCALE.md's flag line (linear with 50%
  * headroom); a quadratic regression would show ×100. Timing is
  * median-of-3 on a warmed session, same protocol as Bench.
  *
  * Gated behind SPARK_GRAFT_SCALE=1 (plus the sf1 dir existing): ~2-4
  * min of deliberate timing runs don't belong in every `sbt test`.
  * Invocation:
  *   SPARK_GRAFT_SCALE=1 sbt "testOnly graft.ScaleSpec"
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf01 = "/root/testdata/sf0.1"
  private val sf1 =
    sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/scratch/sf1")

  private def medianOf3(q: String, dir: String): Double = {
    val fn = SparkEntry.queries(q)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(1)
  }

  test("near-dup chain and kNN join grow sub-quadratically by wall time, sf0.1→sf1") {
    assume(sys.env.get("SPARK_GRAFT_SCALE").contains("1"),
      "set SPARK_GRAFT_SCALE=1 to run the timed scale guard")
    assume(new java.io.File(s"$sf1/documents.parquet").exists,
      s"sf1 testdata missing at $sf1 — runMain graft.ScaleGen first")
    // one warm pass so codegen/scan init lands on neither measurement
    Seq("q_dedup_near_clusters", "q_sim_knn_join")
      .foreach(q => SparkEntry.queries(q)(spark, sf01).count())
    Seq("q_dedup_near_clusters", "q_sim_knn_join").foreach { q =>
      val t01 = medianOf3(q, sf01)
      val t1 = medianOf3(q, sf1)
      val growth = t1 / t01
      info(f"$q: sf0.1=${t01}%.2fs sf1=${t1}%.2fs growth=×$growth%.1f")
      assert(growth < 15.0,
        f"$q grew ×$growth%.1f for 10× data (flag ×15; quadratic ≈ ×100)")
    }
  }
}

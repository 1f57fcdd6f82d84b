package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Skew

/** Salting preserves join/aggregation results while spreading hot keys. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join on the skewed user_id key") {
    val events = Tables.events(spark, sf)  // 15 hot user_id values
    val users = Tables.events(spark, sf)
      .groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("user_events"))
    val plain = events.join(users, col("user_id") === col("uid"))
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("user_events").as("s"))
    val salted = Skew.saltedJoin(events, users, "user_id", "uid", salts = 8)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("user_events").as("s"))
    assert(salted.orderBy("user_id").collect().toSeq ==
           plain.orderBy("user_id").collect().toSeq)
  }

  /** The automatic path: AQE's OptimizeSkewedJoin splits oversized
    * partitions of a sort-merge join at runtime. The fixture encodes the
    * rule's REAL preconditions, each discovered by watching it decline:
    *
    *  - both join inputs must be bare Sort-over-shuffle (a post-shuffle
    *    aggregate between them breaks the rule's pattern match — which
    *    is exactly why [[Skew.saltedJoin]] exists for agg-below-join
    *    shapes);
    *  - the split unit is a MAP-OUTPUT CHUNK, so the skewed input needs
    *    map-side parallelism (a single small file = one chunk =
    *    unsplittable) — hence the repartition(8) upstream;
    *  - detection is on COMPRESSED bytes, so the planted hot rows are
    *    made distinct (identical replicas compress away the skew).
    *
    * The assertion reads the FINAL adaptive plan post-execution, where
    * AQE has re-planned with actual partition sizes.
    */
  test("AQE splits the skewed sort-merge join partitions at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // dominant key: user 1's rows replicated 100×, each replica made
      // distinct so the hot partition's bytes are real
      val base = Tables.events(spark, "/root/testdata/sf0.01")
        .select("event_id", "user_id", "event_type", "value")
      val events = base.where(col("user_id") === 1)
        .withColumn("rep", explode(sequence(lit(1), lit(100))))
        .withColumn("event_id", col("event_id") * 1000 + col("rep"))
        .withColumn("value", col("value") + col("rep") * 0.01)
        .drop("rep")
        .unionByName(base.where(col("user_id") =!= 1))
        .repartition(8)
      val users = Tables.customer(spark, "/root/testdata/sf0.01")
        .select(col("c_custkey").as("uid"), col("c_name").as("user_name"))
      val joined = events.join(users, col("user_id") === col("uid"))
        .select("event_id", "user_id", "event_type", "value", "user_name")
      val rows = joined.collect()
      assert(rows.length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"),
        s"broadcast off must leave an SMJ:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        s"AQE must mark the hot partitions skewed in the final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Companion to the skew-split test: AQE's other runtime join
    * re-plan. The static planner keeps a sort-merge join because static
    * broadcast is off and the filtered build side's size ESTIMATE is the
    * whole table (no CBO column stats); at runtime the filter leaves a
    * few hundred rows, the map stage reports a few KB, and AQE's
    * `spark.sql.adaptive.autoBroadcastJoinThreshold` demotes the SMJ to
    * a broadcast-hash join — the re-plan that saves the 100 TB case
    * where a runtime-filtered dimension turns out tiny.
    */
  test("AQE demotes a planned sort-merge join to broadcast at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      // static planning: never broadcast …
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // … runtime re-planning: broadcast when actual size allows
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val tiny = Tables.orders(spark, "/root/testdata/sf0.01")
        .where(col("o_orderkey") % 97 === 0)
      val j = Tables.lineitem(spark, "/root/testdata/sf0.01")
        .join(tiny, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderpriority", "l_quantity")
      val initial = j.queryExecution.executedPlan.toString
      assert(initial.contains("SortMergeJoin"),
        s"static plan must be a sort-merge join (broadcast off):\n$initial")
      // execute THIS DataFrame's QueryExecution (count() would build a
      // new one, leaving j's adaptive plan unexecuted)
      assert(j.collect().length > 0)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE must demote the SMJ to broadcast once the build side's " +
          s"runtime size is known:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted two-phase aggregation equals direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_l_quantity"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", salts = 8)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("q_agg_salted: two event_type exchanges (salt spread, then merge)") {
    val p = Skew.qAggSalted(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("hashpartitioning\\(event_type".r.findAllIn(p).size == 2,
      s"phase 1 shuffles (key, salt), phase 2 merges per key:\n${p.take(1200)}")
    val got = Skew.qAggSalted(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSeq
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("t"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Double]("t"))).toSeq
    assert(got == direct, "salted merge must be bit-identical to direct")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned-schema contract for the driver's testdata tables.
  *
  * Round 12 lost 26 correctness keys because the driver regenerated
  * `events.ts` under a new parquet encoding AFTER the last commit and
  * the loader assumed one fixed physical type — the failure surfaced as
  * 26 scattered analysis errors instead of one named spec. This suite is
  * the early-warning: it loads every table from the CURRENT testdata
  * exactly as the engine will (via `Tables.*`), materializes a row, and
  * pins the normalized `events.ts` type. A future regeneration that
  * drifts (retyped columns, renamed fields, new nullability) fails HERE,
  * by name, in one run of `sbt test`.
  */
class TablesContractSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val loaders: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region"     -> (Tables.region _),
      "nation"     -> (Tables.nation _),
      "customer"   -> (Tables.customer _),
      "supplier"   -> (Tables.supplier _),
      "part"       -> (Tables.part _),
      "orders"     -> (Tables.orders _),
      "lineitem"   -> (Tables.lineitem _),
      "documents"  -> (Tables.documents _),
      "embeddings" -> (Tables.embeddings _),
      "events"     -> (Tables.events _)
    )

  /** Columns every engine query may reference by name. A regeneration
    * that renames or drops one must fail here, not as scattered
    * UNRESOLVED_COLUMN errors across the gate. Extra columns are allowed
    * (additive drift is harmless).
    */
  private val pinnedColumns = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                        "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
                        "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                        "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value",
                        "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label")
  )

  for ((name, loader) <- loaders) {
    test(s"table `$name` loads from current testdata and materializes a row") {
      val df = loader(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name resolved an empty schema")
      val missing = pinnedColumns(name).filterNot(df.schema.fieldNames.contains)
      assert(missing.isEmpty,
        s"$name lost pinned columns $missing — testdata contract drifted")
      assert(df.limit(1).collect().length == 1, s"$name produced no rows")
    }
  }

  test("events.ts normalizes to session-timezone TimestampType") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts normalized to ${df.schema("ts").dataType}, expected TimestampType")
    // and it must be orderable/comparable against a timestamp literal —
    // exactly the operation that died in round 12's analysis failures
    val n = df.filter(col("ts") >= lit("2020-01-01").cast(TimestampType)).limit(1).collect()
    assert(n.length == 1)
  }

  test("events loader adapts to all three live ts encodings with identical values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_enc_").toString
    val microsUtc = 1700000000123456L // 2023-11-14T22:13:20.123456Z

    // (a) BIGINT epoch-nanos (legacy driver encoding under nanosAsLong,
    //     and ScaleGen's native shape)
    Seq((1L, microsUtc * 1000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/long/events.parquet")

    // (b) TIMESTAMP_NTZ micros (driver encoding as of 2026-08-13)
    Seq((1L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(microsUtc)).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")

    // (c) TIMESTAMP (UTC-adjusted micros)
    Seq((1L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(microsUtc)))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/ltz/events.parquet")

    val loaded = Seq("long", "ntz", "ltz").map { enc =>
      val df = Tables.events(spark, s"$dir/$enc")
      assert(df.schema("ts").dataType == TimestampType, s"encoding $enc")
      enc -> df.select(unix_micros(col("ts"))).as[Long].head()
    }
    loaded.foreach { case (enc, micros) =>
      assert(micros == microsUtc, s"encoding $enc read $micros, expected $microsUtc")
    }
  }

  test("events loader rejects an unsupported ts type loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_bad_").toString
    Seq((1L, "not-a-timestamp", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}

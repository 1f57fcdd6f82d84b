package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftExtensions
import graft.queries.LlmOps

/** Native codegen'd vector expressions vs the HOF reference semantics. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("native cosine is bit-identical to the HOF formulation") {
    GraftExtensions.install(spark)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      col("vec_id"),
      LlmOps.cosine(col("embedding"), col("qv")).as("native"),
      LlmOps.cosineHof(col("embedding"), col("qv")).as("hof"))
    val diff = both.where(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("dot through SQL with the extensions installed") {
    GraftExtensions.install(spark)
    import spark.implicits._
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_vec_dot(a, b) AS d, graft_vec_cosine(a, a) AS c FROM vecs")
      .first()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("null arrays propagate null") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    df.createOrReplaceTempView("vecs_null")
    assert(spark.sql("SELECT graft_vec_dot(a, b) FROM vecs_null")
      .first().isNullAt(0))
  }

  test("optimizer rule rewrites the HOF dot pattern to VectorDot") {
    GraftExtensions.install(spark)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val hof = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), LlmOps.dotHof(col("embedding"), col("qv")).as("d"))
    val plan = hof.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_vec_dot"), plan)
    assert(!plan.toLowerCase.contains("aggregate(zip_with"), plan)
    // and the rewritten plan returns the expected values
    val viaNative = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), LlmOps.cosine(col("embedding"), col("qv")).as("c"))
      .orderBy("vec_id").collect()
    val viaRewritten = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        (LlmOps.dotHof(col("embedding"), col("qv")) /
          (sqrt(LlmOps.norm2Hof(col("embedding"))) *
           sqrt(LlmOps.norm2Hof(col("qv"))))).as("c"))
      .orderBy("vec_id").collect()
    assert(viaNative.map(_.getDouble(1)).toSeq ==
           viaRewritten.map(_.getDouble(1)).toSeq)
  }

  test("codegen plan contains the fused loop (no HOF lambda)") {
    GraftExtensions.install(spark)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val plan = emb.crossJoin(broadcast(q))
      .select(LlmOps.cosine(col("embedding"), col("qv")).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_vec_cosine"))
    assert(!plan.contains("lambdafunction"))
  }
}

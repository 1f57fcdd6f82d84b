package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the package-private Dataset constructor so graft's custom
  * logical plans (plans.AsOfJoin) can become DataFrames. Lives in
  * Spark's classic package purely for access; contains no logic.
  */
object GraftShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Spark 4 Columns wrap ColumnNodes; recover the catalyst Expression. */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)

  /** Wrap a catalyst Expression as a Column — lets query code use custom
    * expressions (VectorCosine, …) directly, with no dependence on the
    * session's function registry.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    ExpressionUtils.column(e)
}

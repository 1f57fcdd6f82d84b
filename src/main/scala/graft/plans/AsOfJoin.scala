package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN (SURVEY.md §2.3 `q_join_asof`): for each left row,
  * the single latest right row with the same key and right-time ≤
  * left-time (ties broken by the caller-supplied tiebreak ordering —
  * last wins).
  *
  * Why a custom operator: Spark has no as-of join, and the relational
  * encoding (`condition join` + `row_number() = 1`) materializes every
  * (left, right-candidate) pair before ranking — fanout × left rows.
  * This operator is the plan you actually want at 100 TB: both sides
  * hash-cluster on the key and sort within partitions (EnsureRequirements
  * inserts exactly one exchange + sort per side), then a single forward
  * merge pass emits one row per left row with O(1) state — no fanout,
  * no window.
  *
  * The full Catalyst surface is exercised: logical node → Strategy →
  * physical node with distribution/ordering requirements, registered via
  * `spark.experimental.extraStrategies` (or session extensions).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(leftKey, leftTime), left.output)
      val rProj = UnsafeProjection.create(Seq(rightKey, rightTime), right.output)
      val outProj = UnsafeProjection.create(output, output)
      val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(keyType)
      val timeOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(timeType)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // O(1) merge state: the best-so-far right row for the current key
      var candidate: UnsafeRow = null
      var candidateKey: Any = null

      lIter.map { lRow =>
        val lkRow = lProj(lRow)
        if (lkRow.isNullAt(0)) {
          outProj(joined(lRow, nullRight))
        } else {
          val lk = lkRow.get(0, keyType)
          val lt = lkRow.get(1, timeType)
          // drop stale candidate when the left key advances
          if (candidateKey != null && keyOrd.compare(candidateKey, lk) != 0) {
            candidate = null; candidateKey = null
          }
          // advance the right side: consume rows with key < lk entirely;
          // rows with key == lk and time <= lt become the candidate
          // (later rows overwrite — sorted order makes last = latest)
          var done = false
          while (!done && rBuf.hasNext) {
            val rkRow = rProj(rBuf.head)
            if (rkRow.isNullAt(0)) { rBuf.next() } // null keys match nothing
            else {
              val c = keyOrd.compare(rkRow.get(0, keyType), lk)
              if (c < 0) { rBuf.next() }
              else if (c == 0 &&
                       (rkRow.isNullAt(1) ||
                        timeOrd.compare(rkRow.get(1, timeType), lt) <= 0)) {
                if (!rkRow.isNullAt(1)) {
                  candidate = rBuf.head.asInstanceOf[UnsafeRow].copy()
                  candidateKey = lk
                }
                rBuf.next()
              } else done = true
            }
          }
          // lt is non-decreasing within the key, so a candidate consumed
          // for an earlier left row remains valid for this one
          if (candidate != null && candidateKey != null &&
              keyOrd.compare(candidateKey, lk) == 0)
            outProj(joined(lRow, candidate))
          else
            outProj(joined(lRow, nullRight))
        }
      }
    }
  }
}

/** Public API. The planner strategy arrives via session conf
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`) or the
  * imperative `GraftExtensions.install` — query code never mutates the
  * session.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           rightTieBreak: Seq[Column] = Nil): DataFrame = {
    val spark = left.sparkSession
    // Spark 4 Columns wrap ColumnNodes; the classic converter recovers
    // the resolved catalyst Expression
    val ex = org.apache.spark.sql.classic.GraftShim.expression _
    val plan = AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      ex(leftKey), ex(rightKey), ex(leftTime), ex(rightTime),
      rightTieBreak.map(ex))
    org.apache.spark.sql.classic.GraftShim.ofRows(spark, plan)
  }
}

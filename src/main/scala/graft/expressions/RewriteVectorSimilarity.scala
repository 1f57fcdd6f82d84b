package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * over float arrays into the native codegen'd [[VectorDot]]. Users
  * writing the declarative HOF form (the natural spelling with builtin
  * functions) transparently get the fused primitive loop — the same
  * IEEE operation order, so results are bit-identical.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`) or
  * imperatively through `spark.experimental.extraOptimizations`.
  */
object RewriteVectorSimilarity extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isDotLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
                        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (stripDoubleCast(l), stripDoubleCast(r)) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          lv.exprId == x.exprId && rv.exprId == y.exprId
        case _ => false
      }
    case _ => false
  }

  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
                        Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _) =>
      a.exprId == acc.exprId && b.exprId == el.exprId
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType), merge, finish)
          if zero == 0.0 && isFloatArray(zw.left) && isFloatArray(zw.right) &&
             isDotLambda(zw.function) && isSumLambda(merge) &&
             isIdentity(finish) =>
        VectorDot(zw.left, zw.right)
    }
}
